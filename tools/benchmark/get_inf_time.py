#!/usr/bin/env python
"""Inference throughput benchmark with device sync (reference: tools/
benchmark/get_inf_time.py:12-41: 200-image fps loop, 5-iter warmup).

Times a chained-forward jit program (data-dependent iterations) so remote
dispatch pipelining cannot inflate the number.

Usage: python tools/benchmark/get_inf_time.py <config.py> [--batch 8] [--iters 20]
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser('Inference throughput')
    p.add_argument('config')
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--iters', type=int, default=20)
    p.add_argument('--shape', type=int, nargs=2, default=[256, 256])
    p.add_argument('--warmup', type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    seg = build_segmentor(cfg.model)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=tuple(args.shape))

    @jax.jit
    def chained(v, img):
        def body(i, carry):
            heads = seg.forward_heads(v, img + carry * 1e-12)
            return jnp.mean(heads['sem'].astype(jnp.float32))

        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0.0))

    img = jnp.zeros((args.batch, *args.shape, 3), jnp.float32)
    for _ in range(max(args.warmup // args.iters, 1)):
        float(chained(variables, img))
    t0 = time.perf_counter()
    float(chained(variables, img))
    dt = time.perf_counter() - t0
    n = args.batch * args.iters
    print(f'{n} images in {dt:.3f}s -> {n / dt:.1f} img/s ({dt / n * 1000:.2f} ms/img)')


if __name__ == '__main__':
    main()
