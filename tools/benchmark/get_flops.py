#!/usr/bin/env python
"""FLOPs/params counter via XLA cost analysis (reference: tools/benchmark/
get_flops.py used thop).

Usage: python tools/benchmark/get_flops.py <config.py> [--shape 256 256]
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser('Model FLOPs/params')
    p.add_argument('config')
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

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables['params']))

    def fwd(v, img):
        return seg.forward_heads(v, img)

    img = jnp.zeros((1, *args.shape, 3), jnp.float32)
    lowered = jax.jit(fwd).lower(variables, img)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan')) if cost else float('nan')
    print(f'input: (1, {args.shape[0]}, {args.shape[1]}, 3)')
    print(f'params: {n_params / 1e6:.2f} M')
    print(f'forward flops (XLA cost analysis): {flops / 1e9:.2f} GFLOPs')


if __name__ == '__main__':
    main()
