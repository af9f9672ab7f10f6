#!/usr/bin/env python
"""Per-model speed-of-light accounting (VERDICT r2 weak #3).

For each segmentor: pull the compiled forward's FLOP and HBM-byte counts
from XLA cost analysis, derive the v5e roofline time (compute bound =
flops / 197 TFLOP/s bf16; bandwidth bound = bytes / 819 GB/s), measure the
actual net-only forward, and report MXU utilization + the headroom left.
Answers "is this model at the hardware ceiling, or leaving 2x on the
table like UNet round 1 did". Reference models being accounted:
tiseg/models/segmentors/{unet,cdnet,hovernet}.py forward paths.

Usage: python tools/model_sol.py [--models UNet,CDNet,HoverNet] [--batch 0]
(batch 0 = per-model bench default). Run on the real chip.

--train switches the accounted program to the full training step
(forward + backward + Adam update, bf16 compute / f32 params, B=32 —
the BENCH_TRAIN program from bench.py) so the 440 p/s train number gets
the same roofline treatment as the eval forwards (VERDICT r2 item 7:
"profile one train step on the real chip — where do the 6.3x go").
"""
import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

V5E_BF16_FLOPS = 197e12   # MXU peak, bf16
V5E_HBM_BPS = 819e9       # HBM bandwidth

FUSED_BATCH = {'HoverNet': 32}
TRAIN_BATCH = {'HoverNet': 8}


def build_train_step(typ: str, B: int, hw: int = 256):
    """The BENCH_TRAIN program (bench.py): one donated jitted step of
    forward + backward + Adam on bf16 compute / f32 params. Returns
    (step, state, batch) with step: (state) -> state (loss folded into
    batch_stats consumer to keep the signature chainable)."""
    import jax
    import jax.numpy as jnp
    from bench import make_universal_label_batch
    from tiseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from tiseg_tpu.engine.train_state import TrainState
    from tiseg_tpu.models import build_segmentor

    if 'MicroNet' in typ:
        hw = 252
    seg = build_segmentor(dict(type=typ, num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')),
                          dtype=jnp.bfloat16)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(hw, hw))
    schedule = build_lr_schedule(dict(policy='fixed'), 1e-4, 1, 100)
    tx = build_optimizer(dict(type='Adam', lr=1e-4, weight_decay=5e-4), schedule)
    state = TrainState.create(variables['params'], variables['batch_stats'], tx)
    rng = np.random.default_rng(0)
    batch = {'data': {'img': jnp.asarray(rng.normal(size=(B, hw, hw, 3)).astype(np.float32))},
             'label': make_universal_label_batch(B, hw)}
    base_key = jax.random.PRNGKey(0)

    def one_step(st):
        key = jax.random.fold_in(base_key, st.step)

        def loss_fn(params):
            vs = {'params': params, 'batch_stats': st.batch_stats}
            total, (logs, new_model_state) = seg.loss(vs, batch, train=True, rng=key)
            return total, new_model_state['batch_stats']

        (total, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        return st.apply_gradients(grads).replace(batch_stats=new_bs)

    return one_step, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--models', default='UNet,CDNet,HoverNet')
    ap.add_argument('--batch', type=int, default=0)
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--hw', type=int, default=256)
    ap.add_argument('--train', action='store_true',
                    help='account the full train step (fwd+bwd+Adam) instead of the eval forward')
    ap.add_argument('--cpu', action='store_true',
                    help='force the CPU backend (smoke tests; JAX_PLATFORMS env is overridden by the image)')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/tiseg_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from tiseg_tpu.models import build_segmentor

    rows = []
    for typ in args.models.split(','):
        opts = {'xla_tpu_scoped_vmem_limit_kib': '65536'}
        if args.train:
            B = args.batch or TRAIN_BATCH.get(typ, 32)
            one_step, state = build_train_step(typ, B, hw=args.hw)
            compiled = jax.jit(one_step).lower(state).compile()

            def _chain(st):
                return jax.lax.fori_loop(0, args.iters, lambda i, s: one_step(s), st)

            try:
                chain = jax.jit(_chain).lower(state).compile(compiler_options=opts)
            except Exception:
                chain = jax.jit(_chain)
            rpc_arg = state.step
            run = lambda: jax.block_until_ready(chain(state))
        else:
            B = args.batch or FUSED_BATCH.get(typ, 64)
            hw = 252 if 'MicroNet' in typ else args.hw  # MicroNet's fixed input contract
            seg = build_segmentor(dict(type=typ, num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')),
                                  dtype=jnp.bfloat16)
            variables = seg.init_variables(jax.random.PRNGKey(0), hw=(hw, hw))
            img = jnp.asarray(np.random.default_rng(0).normal(size=(B, hw, hw, 3)).astype(np.float32)) * 0.2

            # weights as ARGUMENTS (closure constants bloat the serialized
            # HLO past the remote-compile request limit for the big nets)
            def net(v, im):
                out = seg.forward_heads(v, im, train=False)
                return jnp.float32(sum(jnp.max(o).astype(jnp.float32) for o in out.values()))

            compiled = jax.jit(net).lower(variables, img).compile()

            def _chain(v, im):
                def body(i, carry):
                    return net(v, im + carry * 1e-12)
                return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0.0))

            try:
                chain = jax.jit(_chain).lower(variables, img).compile(compiler_options=opts)
            except Exception:
                chain = jax.jit(_chain)
            rpc_arg = img
            run = lambda: float(chain(variables, img))

        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get('flops', 0.0))
        byts = float(ca.get('bytes accessed', 0.0))

        # measured: chained fori_loop, RPC-subtracted (bench.py methodology)
        @jax.jit
        def trivial(x):
            return jnp.float32(jnp.ravel(x)[0])

        jax.block_until_ready(trivial(rpc_arg))
        lat = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(trivial(rpc_arg))
            lat.append(time.perf_counter() - t0)
        rpc = sorted(lat)[len(lat) // 2]

        run()
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        t_meas = max(best - rpc, 1e-9) / args.iters

        t_compute = flops / V5E_BF16_FLOPS
        t_mem = byts / V5E_HBM_BPS
        t_sol = max(t_compute, t_mem)
        print(json.dumps(dict(model=typ, B=B, t_meas_ms=t_meas * 1e3,
                              meas_pps=B / t_meas)), flush=True)
        rows.append(dict(model=typ, B=B,
                         gflop_per_patch=flops / B / 1e9,
                         mb_per_patch=byts / B / 1e6,
                         t_meas_ms=t_meas * 1e3,
                         t_compute_ms=t_compute * 1e3,
                         t_mem_ms=t_mem * 1e3,
                         mxu_util=t_compute / t_meas,
                         sol_headroom=t_meas / t_sol,
                         meas_pps=B / t_meas,
                         sol_pps=B / t_sol))

    hdr = ['model', 'B', 'GFLOP/patch', 'HBM MB/patch', 'meas ms', 'SOL-compute ms', 'SOL-mem ms',
           'MXU util', 'meas/SOL', 'meas p/s', 'SOL p/s']
    print('| ' + ' | '.join(hdr) + ' |')
    print('|' + '---|' * len(hdr))
    for r in rows:
        print(f"| {r['model']} | {r['B']} | {r['gflop_per_patch']:.1f} | {r['mb_per_patch']:.0f} "
              f"| {r['t_meas_ms']:.1f} | {r['t_compute_ms']:.1f} | {r['t_mem_ms']:.1f} "
              f"| {r['mxu_util']:.0%} | {r['sol_headroom']:.2f}x | {r['meas_pps']:.0f} | {r['sol_pps']:.0f} |")
    print(json.dumps(rows))


if __name__ == '__main__':
    main()
