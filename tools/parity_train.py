#!/usr/bin/env python
"""Accuracy-parity harness: train the PyTorch reference and this framework
from IDENTICAL init on IDENTICAL synthetic-nuclei batches, then evaluate
both with the same protocol (whole-mode inference -> host post-processing
-> AJI/Dice/PQ) on a held-out set.

This produces the trained-accuracy evidence the round-1 verdict asked for
without real datasets on disk (VERDICT item 3): forward parity is pinned
by tests/test_ref_parity.py; this harness additionally exercises losses,
optimizer, BN-stat updates, and the eval pipeline end-to-end. The two
trajectories are not bitwise (framework accumulation order differs), so
the acceptance bar is metric closeness on the held-out set.

Usage: python tools/parity_train.py [--steps 300] [--out docs/PARITY.md]
Requires /root/reference (imported via tests/reference_compat stubs).
"""
import argparse
import json
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, 'tests'))

import numpy as np


# ---------------------------------------------------------------------------
# deterministic synthetic nuclei
# ---------------------------------------------------------------------------

def make_image(seed, hw=96, n_inst=18):
    rng = np.random.default_rng(seed)
    inst = np.zeros((hw, hw), np.int32)
    yy, xx = np.mgrid[:hw, :hw]
    nid = 0
    for _ in range(n_inst):
        cy, cx = rng.integers(8, hw - 8, 2)
        a, b = rng.uniform(3.5, 7.5, 2)
        th = rng.uniform(0, np.pi)
        dy, dx = yy - cy, xx - cx
        ry = dy * np.cos(th) + dx * np.sin(th)
        rx = -dy * np.sin(th) + dx * np.cos(th)
        mask = (ry / a) ** 2 + (rx / b) ** 2 <= 1.0
        if (inst[mask] > 0).mean() > 0.25 if mask.any() else True:
            continue
        nid += 1
        inst[mask & (inst == 0)] = nid
    sem = (inst > 0).astype(np.uint8)
    # H&E-ish appearance: dark purple nuclei on pink tissue + noise
    img = np.empty((hw, hw, 3), np.float32)
    base = rng.normal(0, 0.06, (hw, hw, 3))
    img[..., 0] = 0.80 - 0.42 * sem
    img[..., 1] = 0.55 - 0.35 * sem
    img[..., 2] = 0.75 - 0.18 * sem
    img = np.clip(img + base, 0, 1).astype(np.float32)
    return img, sem, inst


def build_split(n, seed0, hw):
    from tiseg_tpu.datasets.ops.label_maps import UNetLabelMake
    lm = UNetLabelMake()
    items = []
    for i in range(n):
        img, sem, inst = make_image(seed0 + i, hw=hw)
        data = {'img': img, 'sem_gt': sem.astype(np.int32), 'inst_gt': inst,
                'seg_fields': ['sem_gt']}
        data = lm(data)
        items.append({'img': img, 'sem_gt': sem, 'inst_gt': inst,
                      'sem_gt_inner': data['sem_gt_inner'].astype(np.int64),
                      'loss_weight_map': data['loss_weight_map'].astype(np.float32)})
    return items


# ---------------------------------------------------------------------------
# eval protocol (shared): argmax -> host instance post-proc -> metrics
# ---------------------------------------------------------------------------

def evaluate(logits_fn, val_items, radius=1):
    from tiseg_tpu.models.segmentors.unet import instance_postprocess
    from tiseg_tpu.utils.metrics.inst_metrics import (pre_eval_bin_aji, pre_eval_bin_pq,
                                                      pre_eval_to_bin_aji, pre_eval_to_bin_pq)
    from tiseg_tpu.utils.metrics.sem_metrics import pre_eval_all_semantic_metric, pre_eval_to_sem_metrics
    ajis, pqs, sems = [], [], []
    for it in val_items:
        logit = logits_fn(it['img'])            # (H, W, C) float32
        sem_pred = np.argmax(logit, axis=-1).astype(np.uint8)
        sem_pred, inst_pred = instance_postprocess(sem_pred, radius=radius)
        ajis.append(pre_eval_bin_aji(inst_pred, it['inst_gt']))
        pqs.append(pre_eval_bin_pq(inst_pred, it['inst_gt']))
        sems.append(pre_eval_all_semantic_metric((sem_pred > 0).astype(np.uint8), it['sem_gt'], 2))
    aji = pre_eval_to_bin_aji(ajis)['Aji']
    pq = pre_eval_to_bin_pq(pqs)
    dice = float(np.asarray(pre_eval_to_sem_metrics(sems, metrics=['Dice'])['Dice']).ravel()[-1])
    return {'Dice': float(dice), 'Aji': float(aji), 'DQ': float(pq['DQ']),
            'SQ': float(pq['SQ']), 'PQ': float(pq['PQ'])}


# ---------------------------------------------------------------------------
# torch reference training
# ---------------------------------------------------------------------------

def train_reference(train_items, order, lr, steps, bs, seed):
    import torch
    from reference_compat import load_reference_models
    load_reference_models()
    from tiseg.models import build_segmentor as ref_build

    torch.manual_seed(seed)
    ref = ref_build(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    init_sd = {k: v.clone() for k, v in ref.state_dict().items()}
    opt = torch.optim.Adam(ref.parameters(), lr=lr)
    ref.train()
    t0 = time.time()
    for s in range(steps):
        idx = order[s]
        img = torch.from_numpy(np.stack([train_items[i]['img'] for i in idx]).transpose(0, 3, 1, 2))
        gt = torch.from_numpy(np.stack([train_items[i]['sem_gt_inner'] for i in idx]))[:, None]
        wm = torch.from_numpy(np.stack([train_items[i]['loss_weight_map'] for i in idx]))
        losses = ref.forward({'img': img}, {'sem_gt_inner': gt, 'loss_weight_map': wm})
        loss = sum(v for k, v in losses.items() if 'loss' in k)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if s % 50 == 0:
            print(f'[torch] step {s}: loss {float(loss):.4f} ({time.time() - t0:.0f}s)')
    ref.eval()

    def logits_fn(img):
        with torch.no_grad():
            out = ref.calculate(torch.from_numpy(img.transpose(2, 0, 1)[None]))
        return out.numpy()[0].transpose(1, 2, 0)

    return ref, init_sd, logits_fn


# ---------------------------------------------------------------------------
# tiseg_tpu training
# ---------------------------------------------------------------------------

def train_ours(train_items, order, lr, steps, bs, init_sd, hw):
    import jax
    import jax.numpy as jnp
    import optax
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.utils.torch_import import import_reference_checkpoint

    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(hw, hw))
    variables = import_reference_checkpoint('UNet', variables, init_sd)
    params, batch_stats = variables['params'], variables['batch_stats']
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, batch_stats, opt_state, img, gt, wm):
        def loss_fn(p):
            batch = {'data': {'img': img}, 'label': {'sem_gt_inner': gt, 'loss_weight_map': wm}}
            total, (logs, new_state) = seg.loss({'params': p, 'batch_stats': batch_stats}, batch,
                                                rng=jax.random.PRNGKey(0))
            return total, (logs, new_state['batch_stats'])

        (total, (logs, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, total

    t0 = time.time()
    for s in range(steps):
        idx = order[s]
        img = jnp.asarray(np.stack([train_items[i]['img'] for i in idx]))
        gt = jnp.asarray(np.stack([train_items[i]['sem_gt_inner'] for i in idx]).astype(np.int32))
        wm = jnp.asarray(np.stack([train_items[i]['loss_weight_map'] for i in idx]))
        params, batch_stats, opt_state, total = step_fn(params, batch_stats, opt_state, img, gt, wm)
        if s % 50 == 0:
            print(f'[tpu]   step {s}: loss {float(total):.4f} ({time.time() - t0:.0f}s)')

    variables = {'params': params, 'batch_stats': batch_stats}
    import jax.numpy as jnp2

    def logits_fn(img):
        out = seg.forward_heads(variables, jnp2.asarray(img[None]))['sem']
        return np.asarray(out, np.float32)[0]

    return variables, logits_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--bs', type=int, default=4)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--hw', type=int, default=96)
    ap.add_argument('--n-train', type=int, default=48)
    ap.add_argument('--n-val', type=int, default=16)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    print('building synthetic dataset...')
    train_items = build_split(args.n_train, 1000, args.hw)
    val_items = build_split(args.n_val, 9000, args.hw)
    rng = np.random.default_rng(args.seed)
    order = [rng.choice(args.n_train, args.bs, replace=False) for _ in range(args.steps)]

    print('training torch reference...')
    ref, init_sd, ref_logits = train_reference(train_items, order, args.lr, args.steps, args.bs, args.seed)
    ref_metrics = evaluate(ref_logits, val_items)
    print('reference:', ref_metrics)

    print('training tiseg_tpu (same init, same batches)...')
    _, our_logits = train_ours(train_items, order, args.lr, args.steps, args.bs, init_sd, args.hw)
    our_metrics = evaluate(our_logits, val_items)
    print('tiseg_tpu:', our_metrics)

    rows = []
    for k in ('Dice', 'Aji', 'DQ', 'SQ', 'PQ'):
        rows.append((k, ref_metrics[k] * 100, our_metrics[k] * 100,
                     (our_metrics[k] - ref_metrics[k]) * 100))
    table = ['| metric | torch reference | tiseg_tpu | diff (pts) |', '|---|---|---|---|']
    table += [f'| {k} | {a:.2f} | {b:.2f} | {d:+.2f} |' for k, a, b, d in rows]
    print('\n'.join(table))
    result = {'steps': args.steps, 'bs': args.bs, 'lr': args.lr, 'hw': args.hw,
              'reference': ref_metrics, 'tiseg_tpu': our_metrics}
    if args.out:
        with open(args.out, 'w') as f:
            f.write('# Trained accuracy parity (synthetic nuclei)\n\n'
                    'UNet trained in BOTH frameworks from identical init on identical\n'
                    f'batches ({args.steps} steps, bs {args.bs}, Adam {args.lr}, {args.hw}x{args.hw}),\n'
                    'evaluated with the shared protocol (whole-mode inference -> host\n'
                    'post-processing -> AJI/Dice/PQ) on a held-out synthetic set.\n'
                    'Produced by tools/parity_train.py.\n\n')
            f.write('\n'.join(table) + '\n\n```json\n' + json.dumps(result, indent=2) + '\n```\n')
        print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
