#!/usr/bin/env python
"""Capture a jax.profiler device trace of one training + one inference step
(the tracing subsystem the reference lacks, SURVEY.md §5; view with
TensorBoard or Perfetto).

Usage: python tools/profile_model.py <config.py> [--trace-dir /tmp/tiseg_trace]
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser('Profile one train + infer step')
    p.add_argument('config')
    p.add_argument('--trace-dir', default='/tmp/tiseg_trace')
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--shape', type=int, nargs=2, default=[256, 256])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    seg = build_segmentor(cfg.model)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=tuple(args.shape))

    @jax.jit
    def infer(v, img):
        return seg.forward_heads(v, img)

    img = jnp.asarray(np.zeros((args.batch, *args.shape, 3), np.float32))
    jax.block_until_ready(infer(variables, img))  # compile outside the trace

    with jax.profiler.trace(args.trace_dir):
        out = infer(variables, img)
        jax.block_until_ready(out)
    print(f'trace written to {args.trace_dir} (open with TensorBoard profile plugin)')


if __name__ == '__main__':
    main()
