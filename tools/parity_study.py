#!/usr/bin/env python
"""Multi-seed trained-accuracy parity study: UNet / CDNet / HoverNet
(VERDICT r2 item 3 — strengthen docs/PARITY.md from n=2 UNet seeds to a
defensible multi-seed, multi-model claim with the reference eval protocol).

Per (model, seed): the torch reference is initialized (torch.manual_seed),
the init is imported into the Flax model (utils.torch_import), both train
on IDENTICAL synthetic-nuclei batch sequences, and both are evaluated with
the SAME protocol — sliding-window (window 64 / overlap 16 on 96^2 images,
scaled-down reference geometry) x 8-view dihedral TTA -> softmax-mean ->
argmax -> host instance post-processing -> AJI/Dice/PQ. The protocol is
one shared numpy implementation driving each framework's patch forward, so
no engine difference can leak into the comparison.

Sides run as separate invocations (--side torch|jax) so the slow torch-CPU
runs can queue in the background; each appends one JSON line to --out.

Usage:
  python tools/parity_study.py --model UNet --seed 0 --steps 1000 --side torch --out /tmp/parity.jsonl
  python tools/parity_study.py --summarize /tmp/parity.jsonl  # mean+-std table
"""
import argparse
import json
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, 'tests'))
sys.path.insert(0, osp.join(ROOT, 'tools'))

import numpy as np

from parity_train import make_image

WS, OS = 64, 16
VIEWS = [(d, f) for d in (0, 90) for f in ('none', 'horizontal', 'vertical', 'diagonal')]

MODEL_CFG = {
    'UNet': dict(bs=4, lr=1e-4, strip=None, radius=1),
    'CDNet': dict(bs=4, lr=1e-4, strip=2, radius=3),
    'HoverNet': dict(bs=2, lr=1e-4, strip=None, radius=1),
    # round-5 additions (VERDICT r4 item 4): the three post-processing
    # families with no trained-accuracy evidence. Each declares its eval
    # head spec [(head_name, n_channels, 'softmax'|'raw'), ...] and a
    # 'post' mode; models without a spec keep the legacy single-softmax
    # path byte-for-byte.
    # DIST: sem argmax + dynamic watershed on the regressed distance map
    # (reference dist.py:275-284, configs/dist/*: inst_norm=False).
    'DIST': dict(bs=4, lr=1e-4, heads=[('sem', 2, 'softmax'), ('dist', 1, 'raw')], post='dist_ws'),
    # MicroNet: 252x252 valid-conv constraint (reference micronet.py:99)
    # -> whole-mode eval on 252^2 images; UNet-style CCL post-proc. bs=1 +
    # a short schedule: a 252^2 torch-CPU step costs ~20 s on this host,
    # so the 1000-step protocol is out of reach (documented in PARITY.md).
    'MicroNet': dict(bs=1, lr=1e-4, strip=None, radius=1, hw=252, ws=252,
                     heads=[('sem', 2, 'softmax')], post='ccl'),
    # MultiTaskCDNet: tc-boundary-strip seed CCL re-expanded into the sem
    # canvas via align_foreground (reference multi_task_cdnet.py:220-243);
    # protocol uses the tc+sem heads with if_ddm off, identically on both
    # sides (dir-aware TTA/DDM is covered by forward-parity + device tests).
    'MultiTaskCDNet': dict(bs=4, lr=1e-4, heads=[('tc', 3, 'softmax'), ('sem', 2, 'softmax')], post='mt'),
}


# ---------------------------------------------------------------------------
# data + labels
# ---------------------------------------------------------------------------

def build_items(model, n, seed0, hw):
    from tiseg_tpu.datasets.ops.label_maps import (BoundLabelMake, DirectionLabelMake, DistanceLabelMake,
                                                   HVLabelMake, UNetLabelMake)
    items = []
    # keep the 18-nuclei/96^2 density when a model needs a bigger canvas
    n_inst = max(1, round(18 * (hw / 96)**2))
    for i in range(n):
        img, sem, inst = make_image(seed0 + i, hw=hw, n_inst=n_inst)
        data = {'img': img, 'sem_gt': sem.astype(np.int32), 'inst_gt': inst, 'seg_fields': ['sem_gt']}
        if model in ('UNet', 'MicroNet'):
            data = UNetLabelMake()(data)
        elif model == 'CDNet':
            data = BoundLabelMake(edge_id=2, selem_radius=(3, 3))(data)
            data = DirectionLabelMake()(data)
        elif model == 'MultiTaskCDNet':
            data = BoundLabelMake(edge_id=2, selem_radius=(3, 3))(data)
            data = DirectionLabelMake()(data)
        elif model == 'HoverNet':
            data = HVLabelMake()(data)
        elif model == 'DIST':
            data = DistanceLabelMake(inst_norm=False)(data)
        data['img'], data['inst_gt'] = img, inst
        items.append(data)
    return items


def torch_label_batch(model, items, idx):
    import torch
    st = lambda k, dt: torch.from_numpy(np.stack([items[i][k] for i in idx]).astype(dt))
    if model == 'UNet':
        return {'sem_gt_inner': st('sem_gt_inner', np.int64)[:, None],
                'loss_weight_map': st('loss_weight_map', np.float32)}
    if model == 'CDNet':
        return {'sem_gt_w_bound': st('sem_gt_w_bound', np.int64)[:, None],
                'dir_gt': st('dir_gt', np.int64)[:, None],
                'point_gt': st('point_gt', np.float32)[:, None]}
    if model == 'MicroNet':
        return {'sem_gt_inner': st('sem_gt_inner', np.int64)[:, None],
                'loss_weight_map': st('loss_weight_map', np.float32)}
    if model == 'DIST':
        return {'sem_gt': st('sem_gt', np.int64)[:, None],
                'dist_gt': st('dist_gt', np.float32)[:, None]}
    if model == 'MultiTaskCDNet':
        return {'sem_gt': st('sem_gt', np.int64)[:, None],
                'sem_gt_w_bound': st('sem_gt_w_bound', np.int64)[:, None],
                'inst_gt': st('inst_gt', np.int64)[:, None],
                'dir_gt': st('dir_gt', np.int64)[:, None],
                'point_gt': st('point_gt', np.float32)[:, None]}
    # HoverNet: our HVLabelMake emits (H, W, 2); reference consumes (B, 2, H, W)
    hv = np.stack([items[i]['hv_gt'] for i in idx]).astype(np.float32).transpose(0, 3, 1, 2)
    return {'sem_gt': st('sem_gt', np.int64)[:, None], 'hv_gt': torch.from_numpy(hv)}


def jax_label_batch(model, items, idx):
    st = lambda k, dt: np.stack([items[i][k] for i in idx]).astype(dt)
    if model == 'UNet':
        return {'sem_gt_inner': st('sem_gt_inner', np.int32),
                'loss_weight_map': st('loss_weight_map', np.float32)}
    if model == 'CDNet':
        return {'sem_gt_w_bound': st('sem_gt_w_bound', np.int32),
                'dir_gt': st('dir_gt', np.int32), 'point_gt': st('point_gt', np.float32)}
    if model == 'MicroNet':
        return {'sem_gt_inner': st('sem_gt_inner', np.int32),
                'loss_weight_map': st('loss_weight_map', np.float32)}
    if model == 'DIST':
        return {'sem_gt': st('sem_gt', np.int32), 'dist_gt': st('dist_gt', np.float32)}
    if model == 'MultiTaskCDNet':
        return {'sem_gt': st('sem_gt', np.int32), 'sem_gt_w_bound': st('sem_gt_w_bound', np.int32),
                'inst_gt': st('inst_gt', np.int32), 'dir_gt': st('dir_gt', np.int32),
                'point_gt': st('point_gt', np.float32)}
    return {'sem_gt': st('sem_gt', np.int32), 'hv_gt': st('hv_gt', np.float32)}


# ---------------------------------------------------------------------------
# shared eval protocol (numpy sliding + TTA driving a patch callback)
# ---------------------------------------------------------------------------

def _pad_amount(size, ws, os_):
    if size - ws > 0:
        rem = (size - ws) % (ws - os_)
        return (ws - os_) - rem if rem else 0
    return ws - size


def _offsets(size1, ws, os_):
    return list(range(0, size1 - os_, ws - os_)) if size1 > ws else [0]


def np_split_inference(calc, img, ws=WS):
    """img (H, W, 3) -> (H, W, K); half-overlap-discard stitching, the
    reference geometry (tiseg/models/segmentors/base.py:255-302)."""
    H, W = img.shape[:2]
    ph, pw = _pad_amount(H, ws, OS), _pad_amount(W, ws, OS)
    H1, W1 = H + ph, W + pw
    canvas = np.zeros((H1, W1, 3), img.dtype)
    canvas[ph // 2:ph // 2 + H, pw // 2:pw // 2 + W] = img
    i_offs, j_offs = _offsets(H1, ws, OS), _offsets(W1, ws, OS)
    out = None
    for ii, i in enumerate(i_offs):
        for jj, j in enumerate(j_offs):
            logit = calc(canvas[i:i + ws, j:j + ws])
            if out is None:
                out = np.zeros((H1, W1, logit.shape[-1]), np.float32)
            si = i + OS // 2 if ii > 0 else 0
            ei = i + ws - OS // 2 if ii < len(i_offs) - 1 else H1
            sj = j + OS // 2 if jj > 0 else 0
            ej = j + ws - OS // 2 if jj < len(j_offs) - 1 else W1
            out[si:ei, sj:ej] = logit[si - i:ei - i, sj - j:ej - j]
    return out[ph // 2:ph // 2 + H, pw // 2:pw // 2 + W]


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _tta(img, rot, flip):
    x = np.rot90(img, k=(rot // 90) % 4, axes=(0, 1))
    if flip == 'horizontal':
        x = x[:, ::-1]
    elif flip == 'vertical':
        x = x[::-1]
    elif flip == 'diagonal':
        x = x[::-1, ::-1]
    return np.ascontiguousarray(x)


def _untta(x, rot, flip):
    if flip == 'horizontal':
        x = x[:, ::-1]
    elif flip == 'vertical':
        x = x[::-1]
    elif flip == 'diagonal':
        x = x[::-1, ::-1]
    return np.ascontiguousarray(np.rot90(x, k=4 - (rot // 90) % 4, axes=(0, 1)))


def _fuse_views(v, heads):
    """Per-head softmax (or raw pass-through) over a channel-stacked view."""
    if heads is None:
        return _softmax(v)
    segs, c0 = [], 0
    for _, w, kind in heads:
        seg = v[..., c0:c0 + w]
        c0 += w
        segs.append(_softmax(seg) if kind == 'softmax' else seg)
    return np.concatenate(segs, axis=-1)


def protocol_eval(calc, val_items, cfg):
    from tiseg_tpu.models.segmentors.multi_task_unet import _mt_postprocess
    from tiseg_tpu.models.segmentors.unet import instance_postprocess
    from tiseg_tpu.models.utils.postprocess import dynamic_watershed
    from tiseg_tpu.utils.metrics.inst_metrics import (pre_eval_bin_aji, pre_eval_bin_pq,
                                                      pre_eval_to_bin_aji, pre_eval_to_bin_pq)
    from tiseg_tpu.utils.metrics.sem_metrics import pre_eval_all_semantic_metric, pre_eval_to_sem_metrics
    heads, post, ws = cfg.get('heads'), cfg.get('post', 'ccl'), cfg.get('ws', WS)
    ajis, pqs, sems = [], [], []
    for it in val_items:
        acc = None
        for rot, flip in VIEWS:
            v = np_split_inference(calc, _tta(it['img'], rot, flip), ws)
            v = _fuse_views(_untta(v, rot, flip), heads)
            acc = v if acc is None else acc + v
        fused = acc / len(VIEWS)
        if post == 'dist_ws':  # reference dist.py:275-284
            sem_pred = np.argmax(fused[..., :2], axis=-1).astype(np.uint8)
            dist = np.clip(fused[..., 2], 0, 255).astype(np.int32)
            inst_pred = dynamic_watershed(dist, 0.0, 0.5).astype(np.int32)
        elif post == 'mt':  # reference multi_task_cdnet.py:220-243 (if_ddm off)
            tc_pred = np.argmax(fused[..., :3], axis=-1)
            sem_arg = np.argmax(fused[..., 3:5], axis=-1).astype(np.uint8)
            bin_pred = tc_pred.copy()
            bin_pred[bin_pred == 2] = 0
            sem_pred, inst_pred = _mt_postprocess(bin_pred, sem_arg)
            inst_pred = inst_pred.astype(np.int32)
        else:
            sem_pred = np.argmax(fused, axis=-1).astype(np.uint8)
            if cfg.get('strip') is not None:
                sem_pred[sem_pred == cfg['strip']] = 0
            sem_pred, inst_pred = instance_postprocess(sem_pred, radius=cfg.get('radius', 1))
        ajis.append(pre_eval_bin_aji(inst_pred, it['inst_gt']))
        pqs.append(pre_eval_bin_pq(inst_pred, it['inst_gt']))
        sems.append(pre_eval_all_semantic_metric((sem_pred > 0).astype(np.uint8),
                                                 (it['inst_gt'] > 0).astype(np.uint8), 2))
    aji = pre_eval_to_bin_aji(ajis)['Aji']
    pq = pre_eval_to_bin_pq(pqs)
    dice = float(np.asarray(pre_eval_to_sem_metrics(sems, metrics=['Dice'])['Dice']).ravel()[-1])
    return {'Dice': float(dice), 'Aji': float(aji), 'DQ': float(pq['DQ']),
            'SQ': float(pq['SQ']), 'PQ': float(pq['PQ'])}


# ---------------------------------------------------------------------------
# sides
# ---------------------------------------------------------------------------

def init_path(model, seed):
    return f'/tmp/parity_init_{model}_{seed}.pth'


def trained_path(model, seed, steps):
    return f'/tmp/parity_trained_{model}_{seed}_{steps}.pth'


def save_torch_init(model, seed):
    """(Re)generate the torch reference init checkpoint for (model, seed)
    WITHOUT training. torch.manual_seed makes the init deterministic, so a
    jax-side run can be launched against a documented torch result even
    after /tmp was wiped (the jax side imports this exact init)."""
    import torch
    from reference_compat import load_reference_models
    load_reference_models()
    from tiseg.models import build_segmentor as ref_build
    torch.manual_seed(seed)
    ref = ref_build(dict(type=model, num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    torch.save(ref.state_dict(), init_path(model, seed))
    print(f'saved {init_path(model, seed)}')


def run_torch(model, seed, steps, hw, n_train, train_items, val_items, order):
    import torch
    torch.set_num_threads(1)
    orig_arange = torch.arange

    def _arange(*a, **kw):  # reference hover_loss hardcodes device='cuda'
        if kw.get('device') == 'cuda':
            kw['device'] = 'cpu'
        return orig_arange(*a, **kw)

    torch.arange = _arange
    from reference_compat import load_reference_models
    load_reference_models()
    from tiseg.models import build_segmentor as ref_build
    cfg = MODEL_CFG[model]
    torch.manual_seed(seed)
    ref = ref_build(dict(type=model, num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    torch.save(ref.state_dict(), init_path(model, seed))
    opt = torch.optim.Adam(ref.parameters(), lr=cfg['lr'])
    ref.train()
    t0 = time.time()
    for s in range(steps):
        idx = order[s]
        img = torch.from_numpy(np.stack([train_items[i]['img'] for i in idx]).transpose(0, 3, 1, 2))
        losses = ref.forward({'img': img}, torch_label_batch(model, train_items, idx))
        loss = sum(v for k, v in losses.items() if 'loss' in k)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if s % 100 == 0:
            print(f'[torch {model} s{seed}] step {s}: loss {float(loss):.4f} ({time.time() - t0:.0f}s)',
                  flush=True)
    ref.eval()
    # trained state feeds the jax-side component-swap bisect (--swap-eval)
    torch.save(ref.state_dict(), trained_path(model, seed, steps))

    def calc(patch):
        with torch.no_grad():
            out = ref.calculate(torch.from_numpy(patch.transpose(2, 0, 1)[None]))
        if model == 'DIST':  # (sem, dist)
            out = torch.cat([out[0], out[1]], dim=1)
        elif model == 'MultiTaskCDNet':  # (tc, sem, dir, point) -> tc|sem
            out = torch.cat([out[0], out[1]], dim=1)
        else:
            out = out[0] if isinstance(out, (tuple, list)) else out
        return out.numpy()[0].transpose(1, 2, 0)

    return protocol_eval(calc, val_items, cfg)


def run_jax(model, seed, steps, hw, n_train, train_items, val_items, order, swap_eval=False):
    import jax
    # Parity runs compare FRAMEWORK semantics, so pin f32 matmuls/convs to
    # true-f32 internal precision: TPU's default (fast bf16 passes) shifted
    # the very first HoverNet loss 7.6721 vs torch/CPU-jax's identical
    # 7.6658 — enough iterated drift to bifurcate a short schedule.
    # Production eval/train stay on the default-precision bf16 path.
    jax.config.update('jax_default_matmul_precision', 'highest')
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/tiseg_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax
    import torch
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.utils.torch_import import import_reference_checkpoint
    cfg = MODEL_CFG[model]
    seg = build_segmentor(dict(type=model, num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(hw, hw))
    init_sd = torch.load(init_path(model, seed), map_location='cpu')
    variables = import_reference_checkpoint(model, variables, init_sd)
    params, batch_stats = variables['params'], variables['batch_stats']
    tx = optax.adam(cfg['lr'])
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, batch_stats, opt_state, img, label, step):
        def loss_fn(p):
            batch = {'data': {'img': img}, 'label': label}
            # per-step dropout key: a FIXED key would reuse one dropout
            # mask for the whole schedule — MicroNet's Dropout(0.5) then
            # permanently silences half the final features (measured:
            # 60 vs 80 Aji on the round-5 study before this fix)
            total, (logs, new_state) = seg.loss({'params': p, 'batch_stats': batch_stats}, batch,
                                                rng=jax.random.fold_in(jax.random.PRNGKey(0), step))
            return total, new_state['batch_stats']

        (total, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state2, total

    t0 = time.time()
    for s in range(steps):
        idx = order[s]
        img = jnp.asarray(np.stack([train_items[i]['img'] for i in idx]))
        label = {k: jnp.asarray(v) for k, v in jax_label_batch(model, train_items, idx).items()}
        params, batch_stats, opt_state, total = step_fn(params, batch_stats, opt_state, img, label,
                                                        jnp.int32(s))
        if s % 100 == 0:
            print(f'[jax {model} s{seed}] step {s}: loss {float(total):.4f} ({time.time() - t0:.0f}s)',
                  flush=True)
    variables = {'params': params, 'batch_stats': batch_stats}

    head_names = [h[0] for h in cfg.get('heads', [('sem', None, 'softmax')])]

    def eval_with(v):
        v = jax.device_put(v)  # once — swapped-in torch trees are host numpy,
        # and re-uploading the full tree per patch call turns the protocol
        # eval into a transfer benchmark over the TPU tunnel
        fwd = jax.jit(lambda vv, im: jnp.concatenate(
            [seg.forward_heads(vv, im)[nm] for nm in head_names], axis=-1))

        def calc(patch):
            return np.asarray(fwd(v, jnp.asarray(patch[None])), np.float32)[0]

        return protocol_eval(calc, val_items, cfg)

    if not swap_eval:
        return eval_with(variables)

    # component-swap bisect (VERDICT r3 item 4): localize a trained-accuracy
    # residual by replacing one component of the jax-trained model with the
    # TORCH-trained one (same seed/batches) and re-running the shared eval.
    # If e.g. only the BN-stats swap moves the metric to the torch value,
    # the residual lives in BN running-stat accumulation.
    tpath = trained_path(model, seed, steps)
    if not osp.exists(tpath):
        raise SystemExit(f'--swap-eval needs the torch-side trained state at {tpath} '
                         '(run --side torch first; it now saves it)')
    tsd = torch.load(tpath, map_location='cpu')
    tvars = import_reference_checkpoint(model, seg.init_variables(jax.random.PRNGKey(0), hw=(hw, hw)), tsd)
    variants = {
        'jax': variables,
        'bn_torch': {'params': params, 'batch_stats': tvars['batch_stats']},
        'backbone_torch': {'params': {**params, 'backbone': tvars['params']['backbone']},
                           'batch_stats': {**batch_stats, 'backbone': tvars['batch_stats']['backbone']}},
        'head_torch': {'params': {**params, 'head': tvars['params']['head']},
                       'batch_stats': {**batch_stats, 'head': tvars['batch_stats']['head']}},
        'all_torch': tvars,
    }
    return {name: eval_with(v) for name, v in variants.items()}


def summarize(path):
    """Mean±std table + per-seed paired diffs, grouped by (model, steps) so
    runs at different schedule lengths are never pooled or mispaired."""
    rows = [json.loads(l) for l in open(path) if l.strip()]
    keys = ('Dice', 'Aji', 'DQ', 'SQ', 'PQ')
    groups = sorted({(r['model'], r['steps']) for r in rows})
    out = ['| model | steps | n seeds | side | ' + ' | '.join(keys) + ' |',
           '|---|---|---|---|' + '---|' * len(keys)]
    for model, steps in groups:
        for side in ('torch', 'jax'):
            sel = [r for r in rows if r['model'] == model and r['side'] == side and r['steps'] == steps]
            if not sel:
                continue
            cells = []
            for k in keys:
                vals = np.array([r['metrics'][k] for r in sel]) * 100
                cells.append(f'{vals.mean():.2f}±{vals.std(ddof=1) if len(vals) > 1 else 0:.2f}')
            out.append(f'| {model} | {steps} | {len(sel)} | {side} | ' + ' | '.join(cells) + ' |')
    print('\n'.join(out))
    # per-seed paired diffs (jax - torch), per schedule length
    for model, steps in groups:
        t = {r['seed']: r['metrics'] for r in rows
             if r['model'] == model and r['side'] == 'torch' and r['steps'] == steps}
        j = {r['seed']: r['metrics'] for r in rows
             if r['model'] == model and r['side'] == 'jax' and r['steps'] == steps}
        common = sorted(set(t) & set(j))
        if common:
            d = np.array([[j[s][k] - t[s][k] for k in keys] for s in common]) * 100
            print(f'{model} @{steps} steps: paired diff (jax-torch, pts) over seeds {common}:')
            for i, k in enumerate(keys):
                print(f'  {k}: mean {d[:, i].mean():+.2f} ± {d[:, i].std(ddof=1) if len(common) > 1 else 0:.2f}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='UNet', choices=list(MODEL_CFG))
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--steps', type=int, default=1000)
    ap.add_argument('--hw', type=int, default=None,
                    help='image size (default: per-model — 96, or 252 for MicroNet)')
    ap.add_argument('--n-train', type=int, default=48)
    ap.add_argument('--n-val', type=int, default=16)
    ap.add_argument('--side', choices=('torch', 'jax'))
    # default inside the repo so results survive /tmp wipes between sessions
    ap.add_argument('--out', default=osp.join(ROOT, 'docs', 'parity_runs.jsonl'))
    ap.add_argument('--summarize', default=None)
    ap.add_argument('--init-only', action='store_true',
                    help='only (re)generate the torch init checkpoint for (model, seed)')
    ap.add_argument('--swap-eval', action='store_true',
                    help='jax side: also evaluate with BN-stats/backbone/head swapped '
                         'in from the torch-side TRAINED state (component bisect)')
    args = ap.parse_args()
    if args.summarize:
        summarize(args.summarize)
        return
    if args.init_only:
        save_torch_init(args.model, args.seed)
        return

    if args.hw is None:
        args.hw = MODEL_CFG[args.model].get('hw', 96)
    train_items = build_items(args.model, args.n_train, 1000, args.hw)
    val_items = build_items(args.model, args.n_val, 9000, args.hw)
    rng = np.random.default_rng(args.seed)
    order = [rng.choice(args.n_train, MODEL_CFG[args.model]['bs'], replace=False)
             for _ in range(args.steps)]
    if args.side == 'torch':
        metrics = run_torch(args.model, args.seed, args.steps, args.hw, args.n_train,
                            train_items, val_items, order)
        variants = {'torch': metrics}
    else:
        metrics = run_jax(args.model, args.seed, args.steps, args.hw, args.n_train,
                          train_items, val_items, order, swap_eval=args.swap_eval)
        variants = metrics if args.swap_eval else {'jax': metrics}
    with open(args.out, 'a') as f:
        for side, m in variants.items():
            row = {'model': args.model, 'seed': args.seed, 'side': side, 'steps': args.steps,
                   'metrics': m}
            print(json.dumps(row))
            f.write(json.dumps(row) + '\n')


if __name__ == '__main__':
    main()
