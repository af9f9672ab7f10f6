"""End-to-end inference benchmark: 256x256 patches/sec/chip through the
flagship model — network forward + argmax + full on-device instance
post-processing (fill holes, CCL, disk dilation).

Each stage is timed as ONE jit program chaining ITERS iterations with a
data dependency, so neither host-side pipelining, RPC latency, nor result
caching can inflate the number (the remote-dispatch runtime makes naive
block_until_ready timing unreliable). The two chains are compiled
separately (fusing the vmapped while-loop post-processor into the conv
chain blows up remote compile time); end-to-end throughput combines both
measured rates.

Target (BASELINE.md): >= 5,000 patches/sec/chip net+post-proc on v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PATCHES_PER_SEC = 5000.0


def timed_chain(fn, *args, trials=3):
    """Median-free min-of-trials wall time of one jit call, with a host
    fetch of the scalar result to force completion."""
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        float(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.ops.ccl import instance_postprocess_device

    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')),
                          dtype=jnp.bfloat16)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(256, 256))

    B = int(os.environ.get('BENCH_BATCH', 32))
    ITERS = int(os.environ.get('BENCH_ITERS', 16))
    include_postproc = os.environ.get('BENCH_POSTPROC', '1') == '1'

    # ---- stage 1: network forward + argmax --------------------------------
    @jax.jit
    def net_chain(variables, img):
        def body(i, carry):
            logits = seg.forward_heads(variables, img + carry * 1e-12)['sem']
            return jnp.mean(jnp.argmax(logits, axis=-1).astype(jnp.float32))

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    img = jnp.zeros((B, 256, 256, 3), jnp.float32)
    float(net_chain(variables, img))  # compile
    net_dt = timed_chain(net_chain, variables, img)
    net_rate = B * ITERS / net_dt

    total_rate = net_rate
    if include_postproc:
        # ---- stage 2: on-device instance post-processing ------------------
        pp = partial(instance_postprocess_device, radius=1, num_classes=2, max_instances=1024)

        @jax.jit
        def pp_chain(sem_batch):
            def body(i, carry):
                _, inst = jax.vmap(pp)((sem_batch + carry.astype(jnp.int32)) % 2)
                return jnp.float32(jnp.max(inst))

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        import numpy as np
        rng = np.random.default_rng(0)
        sem_batch = jnp.asarray((rng.random((B, 256, 256)) > 0.7).astype(np.int32))
        float(pp_chain(sem_batch))  # compile
        pp_dt = timed_chain(pp_chain, sem_batch)
        pp_rate = B * ITERS / pp_dt
        total_rate = 1.0 / (1.0 / net_rate + 1.0 / pp_rate)

    print(json.dumps({
        'metric': 'unet_256x256_e2e_throughput' if include_postproc else 'unet_256x256_infer_throughput',
        'value': round(total_rate, 1),
        'unit': 'patches/sec/chip',
        'vs_baseline': round(total_rate / BASELINE_PATCHES_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
