#!/usr/bin/env python
"""Gradient-level training parity probe vs the PyTorch reference.

Builds one segmentor in both frameworks at IDENTICAL weights (torch init
-> tiseg_tpu.utils.torch_import), runs ONE train-mode forward + backward
on an IDENTICAL batch, and compares

  (a) the total loss and each framework's loss components, and
  (b) EVERY parameter gradient elementwise — the torch grads are carried
      into the flax layout by substituting each parameter's ``.grad`` for
      its value in the state_dict and re-running the SAME importer, so
      whatever layout transposition the importer applies to a weight is
      applied to its gradient identically.

Purpose: localize the small one-sided CDNet trained-parity gap seen in
docs/PARITY.md. If the first-step gradients agree to float tolerance,
loss semantics and backward numerics are pinned and the residual drift
can only be iterated accumulation-order / BN-running-stat rounding; a
mismatch here would instead point at a concrete loss/backward defect.

Reference train-step semantics being compared against:
/root/reference/tiseg/models/segmentors/base.py:70-101 (train_step sums
the 'loss'-named keys) and e.g. cdnet.py:277-321 (per-head losses).

Usage:
  python tools/grad_parity.py --model CDNet [--hw 96] [--bs 4] [--seed 0]
"""
import argparse
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, 'tests'))
sys.path.insert(0, osp.join(ROOT, 'tools'))

import numpy as np

from parity_study import build_items, jax_label_batch, torch_label_batch


def run(model: str, hw: int, bs: int, seed: int, topk: int = 12):
    import torch
    torch.set_num_threads(max(torch.get_num_threads(), 2))
    orig_arange = torch.arange

    def _arange(*a, **kw):  # reference hover_loss hardcodes device='cuda'
        if kw.get('device') == 'cuda':
            kw['device'] = 'cpu'
        return orig_arange(*a, **kw)

    torch.arange = _arange
    from reference_compat import load_reference_models
    load_reference_models()
    from tiseg.models import build_segmentor as ref_build

    items = build_items(model, bs, seed0=1000 + seed, hw=hw)
    idx = list(range(bs))
    img_np = np.stack([it['img'] for it in items])  # (B, H, W, 3) float32

    # ---- torch side: one train-mode forward + backward --------------------
    torch.manual_seed(seed)
    ref = ref_build(dict(type=model, num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    ref.train()
    init_sd = {k: v.clone() for k, v in ref.state_dict().items()}
    timg = torch.from_numpy(img_np.transpose(0, 3, 1, 2))
    tlosses = ref.forward({'img': timg}, torch_label_batch(model, items, idx))
    ttotal = sum(v for k, v in tlosses.items() if 'loss' in k)
    ref.zero_grad()
    ttotal.backward()
    grad_sd = dict(init_sd)
    for name, p in ref.named_parameters():
        grad_sd[name] = p.grad.detach().clone() if p.grad is not None else torch.zeros_like(p)
    tcomp = {k: float(v) for k, v in tlosses.items() if 'loss' in k}
    print(f'[torch] total {float(ttotal):.6f}  components:')
    for k, v in sorted(tcomp.items()):
        print(f'    {k:40s} {v:.6f}')

    # ---- jax side: identical weights + batch, value_and_grad --------------
    # sitecustomize pins JAX_PLATFORMS=axon; this probe is a CPU-exact
    # numerics comparison, so force the CPU backend before jax backends init.
    import os
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.utils.torch_import import import_reference_checkpoint

    seg = build_segmentor(dict(type=model, num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(hw, hw))
    variables = import_reference_checkpoint(model, variables, init_sd)
    grad_vars = import_reference_checkpoint(model, variables, grad_sd)
    want_grads = grad_vars['params']

    label = {k: jnp.asarray(v) for k, v in jax_label_batch(model, items, idx).items()}
    batch = {'data': {'img': jnp.asarray(img_np)}, 'label': label}

    def loss_fn(p):
        total, (logs, _new_state) = seg.loss({'params': p, 'batch_stats': variables['batch_stats']},
                                             batch, rng=jax.random.PRNGKey(0))
        return total, logs

    (jtotal, jlogs), jgrads = jax.value_and_grad(loss_fn, has_aux=True)(variables['params'])
    print(f'[jax]   total {float(jtotal):.6f}  components:')
    for k, v in sorted(jlogs.items()):
        if 'loss' in k:
            print(f'    {k:40s} {float(v):.6f}')
    dtotal = abs(float(jtotal) - float(ttotal)) / max(abs(float(ttotal)), 1e-6)
    print(f'total loss rel diff: {dtotal:.2e}')

    # ---- elementwise gradient comparison -----------------------------------
    flat_j = jax.tree_util.tree_flatten_with_path(jgrads)[0]
    flat_t = {jax.tree_util.keystr(kp): np.asarray(v)
              for kp, v in jax.tree_util.tree_flatten_with_path(want_grads)[0]}
    rows = []
    for kp, gj in flat_j:
        key = jax.tree_util.keystr(kp)
        gj = np.asarray(gj, np.float64)
        gt = flat_t[key].astype(np.float64)
        scale = max(float(np.abs(gt).max()), 1e-12)
        err = float(np.abs(gj - gt).max())
        rows.append((err / scale, err, scale, key))
    rows.sort(reverse=True)
    print(f'\nworst {topk} gradient leaves (rel = max|dg| / max|g_torch|):')
    for rel, err, scale, key in rows[:topk]:
        print(f'    rel {rel:9.2e}  abs {err:9.2e}  scale {scale:9.2e}  {key}')
    worst = rows[0][0]
    n_bad = sum(1 for r in rows if r[0] > 1e-3)
    print(f'\n{len(rows)} param leaves; worst rel {worst:.2e}; {n_bad} leaves above 1e-3')
    return worst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='CDNet')
    ap.add_argument('--hw', type=int, default=96)
    ap.add_argument('--bs', type=int, default=4)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()
    run(args.model, args.hw, args.bs, args.seed)


if __name__ == '__main__':
    main()
