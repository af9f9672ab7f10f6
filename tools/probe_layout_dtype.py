#!/usr/bin/env python
"""Micro-probe: conv throughput vs layout (NHWC/NCHW) and dtype (bf16/int8)
on the real chip.

Two decisions hang on these numbers (VERDICT r2 item 1c / round-3 notes):
  * NCHW-native end-to-end was the one untried lever named by the round-2
    verdict — probe whether XLA's TPU conv emitter prefers NCHW at our
    shapes before committing to a layout rewrite of the zoo.
  * v5e's MXU doubles int8 throughput (394 TOPS vs 197 TFLOP/s bf16) — if
    int8 x int8 -> int32 convs actually emit at ~2x at our shapes, a
    post-training-quantized eval path beats the bf16 speed-of-light the
    round-3 ceiling account is pinned to.

Representative shapes: the UNet trunk/decoder stages that dominate the
round-2 per-op profile (docs/ROUND2.md), plus one 1x1. Methodology:
chained fori_loop + RPC subtraction (bench.py).

Usage: python tools/probe_layout_dtype.py [--iters 16] [--batch 64]
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

# (H, W, Cin, Cout, k) — UNet 256^2 hot stages (docs/ROUND2.md profile)
SHAPES = [
    (256, 256, 64, 64, 3),    # stage0 conv1
    (128, 128, 64, 128, 3),   # stage1 conv0
    (64, 64, 128, 256, 3),    # stage2 conv0
    (256, 256, 64, 2, 1),     # cls head 1x1
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=16)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--cpu', action='store_true')
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
    from jax import lax

    B = args.batch
    rng = np.random.default_rng(0)

    @jax.jit
    def trivial(x):
        return jnp.float32(jnp.ravel(x)[0].astype(jnp.float32))

    def rpc_of(x):
        jax.block_until_ready(trivial(x))
        lat = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(trivial(x))
            lat.append(time.perf_counter() - t0)
        return sorted(lat)[len(lat) // 2]

    def time_conv(x, w, dn, preferred=None, iters=args.iters):
        intlike = jnp.issubdtype(x.dtype, jnp.integer)

        def chain(x0):
            def body(i, acc):
                # carry-dependent perturbation so LICM can't hoist the conv
                # out of the loop; full-sum consumption so nothing is sliced
                if intlike:
                    x2 = x0 + jnp.clip(acc, 0.0, 0.0).astype(x0.dtype)
                else:
                    x2 = x0 + (acc * 1e-20).astype(x0.dtype)
                y = lax.conv_general_dilated(x2, w, (1, 1), 'SAME', dimension_numbers=dn,
                                             preferred_element_type=preferred)
                return acc + jnp.sum(y).astype(jnp.float32) * 1e-20

            return lax.fori_loop(0, iters, body, jnp.float32(0.0))

        fn = jax.jit(chain)
        try:
            float(fn(x))
        except Exception as e:
            return None, f'{type(e).__name__}: {str(e)[:120]}'
        rpc = rpc_of(x)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(x))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return max(best - rpc, 1e-9) / iters, None

    print(f'B={B} iters={args.iters}')
    print('| shape | variant | ms | TFLOP/s (or TOP/s) |')
    print('|---|---|---|---|')
    for (H, W, Ci, Co, k) in SHAPES:
        flops = 2.0 * B * H * W * Ci * Co * k * k
        cases = []
        x_hwc = jnp.asarray(rng.normal(size=(B, H, W, Ci)).astype(np.float32), jnp.bfloat16)
        w_hwio = jnp.asarray(rng.normal(size=(k, k, Ci, Co)).astype(np.float32), jnp.bfloat16)
        cases.append(('bf16 NHWC', x_hwc, w_hwio, ('NHWC', 'HWIO', 'NHWC'), None))
        x_chw = jnp.transpose(x_hwc, (0, 3, 1, 2))
        w_oihw = jnp.transpose(w_hwio, (3, 2, 0, 1))
        cases.append(('bf16 NCHW', x_chw, w_oihw, ('NCHW', 'OIHW', 'NCHW'), None))
        xi8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, Ci)), jnp.int8)
        wi8 = jnp.asarray(rng.integers(-127, 127, (k, k, Ci, Co)), jnp.int8)
        cases.append(('int8 NHWC->i32', xi8, wi8, ('NHWC', 'HWIO', 'NHWC'), jnp.int32))
        for name, x, w, dn, pref in cases:
            t, err = time_conv(x, w, dn, pref)
            if t is None:
                print(f'| {H}x{W}x{Ci}->{Co} k{k} | {name} | FAILED | {err} |')
            else:
                print(f'| {H}x{W}x{Ci}->{Co} k{k} | {name} | {t * 1e3:.2f} | {flops / t / 1e12:.1f} |')


if __name__ == '__main__':
    main()
