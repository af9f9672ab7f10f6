#!/usr/bin/env python
"""Dissect the whole-image (1000^2 MoNuSeg protocol) eval program into its
three cost components on the real chip:
  1. TTA x sliding-window network forward (8 views x 5x5 grid = 200 patches)
  2. view fusion + stitch overhead (inference-only vs raw patch cost)
  3. >512^2 instance post-processing (the HBM-resident XLA sweep path)

Drives the same modules as BENCH_WHOLE=1 (bench.py:bench_whole_image);
used to decide where the 1000^2 wall-clock goes. Reference hot loop being
rebuilt: tiseg/models/segmentors/base.py:255-302 + unet.py:71-93.
"""
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def median_rpc(jnp, jax, img):
    @jax.jit
    def trivial(x):
        return jnp.float32(x[0, 0, 0, 0])

    float(trivial(img))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(img))
        lat.append(time.perf_counter() - t0)
    return sorted(lat)[len(lat) // 2]


def time_chain(jax, jnp, fn, arg, iters=4, reps=3, rpc=0.0):
    """fn(arg) -> scalar-reducible pytree; chained fori_loop timing."""
    def _chain(a):
        def body(i, carry):
            out = fn(a + carry * 1e-12 if a.dtype.kind == 'f' else a + jnp.minimum(carry.astype(a.dtype), 0))
            leaves = jax.tree_util.tree_leaves(out)
            return jnp.float32(sum(jnp.max(l).astype(jnp.float32) for l in leaves))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    c = jax.jit(_chain)
    float(c(arg))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(c(arg))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return max(best - rpc, 1e-9) / iters


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/tiseg_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from tiseg_tpu.models import build_segmentor

    hw = int(os.environ.get('PROF_HW', 1000))
    test_cfg = dict(mode='split', crop_size=(256, 256), overlap_size=(40, 40),
                    rotate_degrees=[0, 90],
                    flip_directions=['none', 'horizontal', 'vertical', 'diagonal'],
                    device_postprocess=True, pp_sweeps=8, radius=1,
                    patch_batch=int(os.environ.get('PROF_PATCH_BATCH', 25)))
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=test_cfg),
                          dtype=jnp.bfloat16)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(256, 256))
    img = jnp.asarray(np.random.default_rng(0).normal(size=(1, hw, hw, 3)).astype(np.float32)) * 0.2
    rpc = median_rpc(jnp, jax, img)
    print(f'rpc_latency: {rpc * 1e3:.1f} ms')

    # 1. full fused program (matches BENCH_WHOLE)
    t_full = time_chain(jax, jnp, lambda im: seg.inference_and_postprocess(variables, im)['inst_pred'],
                        img, rpc=rpc)
    print(f'full inference+pp:      {t_full * 1e3:7.1f} ms/image ({1.0 / t_full:.2f} img/s)')

    # 2. inference only (TTA x sliding + fuse + stitch, no pp)
    t_inf = time_chain(jax, jnp, lambda im: seg.inference(variables, im)['sem'], img, rpc=rpc)
    print(f'inference only:         {t_inf * 1e3:7.1f} ms/image')

    # 3. raw patch forwards at the same chunking: 200 patches of 256^2
    prep = seg.prepare_inference(variables)
    patches = jnp.asarray(np.random.default_rng(1).normal(size=(200, 256, 256, 3)).astype(np.float32))

    from tiseg_tpu.ops.sliding import chunked_apply

    def raw(p):
        return chunked_apply(lambda x: seg.forward_heads(variables, x, train=False, prep=prep)['sem'],
                             p, test_cfg['patch_batch'])

    t_raw = time_chain(jax, jnp, raw, patches, rpc=rpc)
    print(f'200 raw patch forwards: {t_raw * 1e3:7.1f} ms (chunk={test_cfg["patch_batch"]})')

    # 4. post-processing alone on a (1, hw, hw) argmax plane (XLA >512^2 path)
    sem = (np.random.default_rng(2).random((1, hw, hw)) < 0.2).astype(np.int32)
    sem_j = jnp.asarray(sem)
    t_pp = time_chain(jax, jnp, lambda s: seg._device_instance_pp(s)[1], sem_j, rpc=rpc)
    print(f'instance pp ({hw}^2):    {t_pp * 1e3:7.1f} ms/image')

    print(f'residual (fuse/stitch/TTA glue): {(t_full - t_raw - t_pp) * 1e3:.1f} ms')


if __name__ == '__main__':
    main()
