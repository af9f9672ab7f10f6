#!/usr/bin/env python
"""Converged-model int8 PTQ accuracy study (VERDICT r3 item 5).

The bench's held-out gate scores int8 on a briefly-trained (60-step) net;
this tool provides the evidence the DEFAULT eval path actually needs:
train a model to convergence on the synthetic-nuclei workload (TPU,
parity_study data/labels), calibrate the int8 executor on val crops
(`tools/test.py --int8-calib` semantics), and score bf16 vs int8(-resident)
on held-out images with the full instance metrics. Appends one JSON row
per run to docs/int8_gate_runs.jsonl.

Usage:
  python tools/int8_gate_study.py --model UNet --steps 2000
  python tools/int8_gate_study.py --model CDNet --steps 2000
"""
import argparse
import json
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, 'tools'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='UNet', choices=['UNet', 'CDNet', 'HoverNet'])
    ap.add_argument('--steps', type=int, default=2000)
    ap.add_argument('--hw', type=int, default=96)
    ap.add_argument('--n-train', type=int, default=48)
    ap.add_argument('--n-val', type=int, default=16)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--calib', type=int, default=16)
    ap.add_argument('--float-prefixes', default='',
                    help="HoverNet only: comma-separated conv-site prefixes kept on the "
                         "float path, e.g. 'stem,l0,l1' = stride>=8-only int8 "
                         "(the trunk-noise probe, VERDICT r4 item 10)")
    ap.add_argument('--out', default=osp.join(ROOT, 'docs', 'int8_gate_runs.jsonl'))
    args = ap.parse_args()

    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', osp.join(ROOT, '.jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax
    from parity_study import MODEL_CFG, build_items, jax_label_batch
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.utils.metrics.inst_metrics import (pre_eval_bin_aji, pre_eval_bin_pq,
                                                      pre_eval_to_bin_aji, pre_eval_to_bin_pq)

    cfg = MODEL_CFG[args.model]
    train_items = build_items(args.model, args.n_train, 1000, args.hw)
    val_items = build_items(args.model, args.n_val, 9000, args.hw)
    rng = np.random.default_rng(args.seed)
    order = [rng.choice(args.n_train, cfg['bs'], replace=False) for _ in range(args.steps)]

    seg = build_segmentor(dict(type=args.model, num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', radius=cfg['radius'])),
                          dtype=jnp.bfloat16)
    variables = seg.init_variables(jax.random.PRNGKey(args.seed), hw=(args.hw, args.hw))
    params, batch_stats = variables['params'], variables['batch_stats']
    tx = optax.adam(cfg['lr'])
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, batch_stats, opt_state, img, label, step):
        def loss_fn(p):
            batch = {'data': {'img': img}, 'label': label}
            total, (logs, new_state) = seg.loss({'params': p, 'batch_stats': batch_stats}, batch,
                                                rng=jax.random.fold_in(jax.random.PRNGKey(0), step))
            return total, new_state['batch_stats']

        (total, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state2, total

    t0 = time.time()
    for s in range(args.steps):
        idx = order[s]
        img = jnp.asarray(np.stack([train_items[i]['img'] for i in idx]))
        label = {k: jnp.asarray(v) for k, v in jax_label_batch(args.model, train_items, idx).items()}
        params, batch_stats, opt_state, total = step_fn(params, batch_stats, opt_state, img, label,
                                                        jnp.int32(s))
        if s % 200 == 0:
            print(f'[{args.model}] step {s}: loss {float(total):.4f} ({time.time() - t0:.0f}s)', flush=True)
    variables = {'params': params, 'batch_stats': batch_stats}

    # calibrate on the FIRST `calib` val images (tools/test.py semantics:
    # center crops from the test set); score on ALL val images — the gate
    # question is int8-vs-bf16 at converged weights, same protocol both ways
    calib = jnp.asarray(np.stack([val_items[i]['img'] for i in range(min(args.calib, args.n_val))]))
    if args.float_prefixes and args.model == 'HoverNet':
        seg.calibrate_int8(variables, calib,
                           float_site_prefixes=tuple(args.float_prefixes.split(',')))
    else:
        seg.calibrate_int8(variables, calib)
    imgs = jnp.asarray(np.stack([it['img'] for it in val_items]))

    from tiseg_tpu.models.segmentors.unet import instance_postprocess
    results = {}
    for mode in ('bf16', 'int8'):
        seg.test_cfg['int8_eval'] = mode == 'int8'
        heads = jax.jit(lambda v, im: seg.forward_heads(v, im))(variables, imgs)
        if args.model == 'UNet':
            sem_pred = np.asarray(jnp.argmax(heads['sem'], -1), np.uint8)
            planes = [instance_postprocess(sem_pred[i], radius=cfg['radius'])[1]
                      for i in range(len(val_items))]
        else:
            # model-specific host post-processing from fused numpy maps
            planes = []
            for i in range(len(val_items)):
                fused = {k: np.asarray(v[i], np.float32) for k, v in heads.items()}
                out = seg.postprocess(fused)
                planes.append(out['inst_pred'])
        ajis, pqs = [], []
        for i, it in enumerate(val_items):
            ajis.append(pre_eval_bin_aji(planes[i].astype(np.int32), it['inst_gt']))
            pqs.append(pre_eval_bin_pq(planes[i].astype(np.int32), it['inst_gt']))
        results[mode] = {'Aji': round(float(pre_eval_to_bin_aji(ajis)['Aji']) * 100, 3),
                         'PQ': round(float(pre_eval_to_bin_pq(pqs)['PQ']) * 100, 3)}
        print(mode, results[mode], flush=True)
    row = {'model': args.model, 'steps': args.steps, 'seed': args.seed, 'hw': args.hw,
           'calib': int(min(args.calib, args.n_val)),
           **({'float_prefixes': args.float_prefixes} if args.float_prefixes else {}),
           'bf16': results['bf16'], 'int8': results['int8'],
           'delta_aji_pts': round(results['int8']['Aji'] - results['bf16']['Aji'], 3),
           'delta_pq_pts': round(results['int8']['PQ'] - results['bf16']['PQ'], 3)}
    print(json.dumps(row))
    with open(args.out, 'a') as f:
        f.write(json.dumps(row) + '\n')


if __name__ == '__main__':
    main()
