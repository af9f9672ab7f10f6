"""End-to-end inference benchmark: 256x256 patches/sec/chip through the
flagship model.

The timed region is ONE jit program that chains ITERS forward passes with a
data dependency (each iteration's input is perturbed by the previous
iteration's output), so neither host-side pipelining, RPC latency, nor
result caching can inflate the number — the device must execute every
forward serially.

Target (BASELINE.md): >= 5,000 patches/sec/chip net+post-proc on v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PATCHES_PER_SEC = 5000.0


def main():
    import jax
    import jax.numpy as jnp
    from tiseg_tpu.models import build_segmentor

    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')),
                          dtype=jnp.bfloat16)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(256, 256))

    B = int(os.environ.get('BENCH_BATCH', 32))
    ITERS = int(os.environ.get('BENCH_ITERS', 16))

    include_postproc = os.environ.get('BENCH_POSTPROC', '1') == '1'

    def forward(variables, img):
        logits = seg.forward_heads(variables, img)['sem']
        sem_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if include_postproc:
            # full instance recovery on device (fill holes, CCL, dilation)
            from tiseg_tpu.ops.ccl import instance_postprocess_device
            from functools import partial
            pp = partial(instance_postprocess_device, radius=1, num_classes=2, max_instances=1024)
            _, inst = jax.vmap(pp)(sem_pred)
            return inst.astype(jnp.float32)
        return sem_pred.astype(jnp.float32)

    @jax.jit
    def chained(variables, img):
        def body(i, carry):
            pred = forward(variables, img + carry * 1e-12)
            return jnp.mean(pred)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    img = jnp.zeros((B, 256, 256, 3), jnp.float32)
    # compile + warm
    float(chained(variables, img))

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = float(chained(variables, img))  # host fetch of a scalar: full completion
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    patches_per_sec = B * ITERS / best
    print(json.dumps({
        'metric': 'unet_256x256_infer_throughput',
        'value': round(patches_per_sec, 1),
        'unit': 'patches/sec/chip',
        'vs_baseline': round(patches_per_sec / BASELINE_PATCHES_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
