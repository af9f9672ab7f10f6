"""Per-segmentor smoke tests: forward shapes, finite loss + nonzero grads,
whole-mode inference + instance post-processing on synthetic data."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.models import build_segmentor

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow

HW = 64


def synth_labels(rng, n=2):
    sem = np.zeros((n, HW, HW), np.int32)
    sem[:, 10:30, 10:30] = 1
    sem_wb = sem.copy()
    sem_wb[:, 10:12, 10:30] = 2
    dist = (sem > 0).astype(np.float32) * 0.8
    hv = np.zeros((n, HW, HW, 2), np.float32)
    hv[:, 10:30, 10:30, 0] = np.linspace(-1, 1, 20)[None, None, :]
    hv[:, 10:30, 10:30, 1] = np.linspace(-1, 1, 20)[None, :, None]
    return {
        'sem_gt': jnp.asarray(sem),
        'sem_gt_inner': jnp.asarray(sem),
        'sem_gt_w_bound': jnp.asarray(sem_wb),
        'loss_weight_map': jnp.ones((n, HW, HW)),
        'dist_gt': jnp.asarray(dist),
        'hv_gt': jnp.asarray(hv),
    }


CASES = [
    ('UNet', 2, {}),
    ('CUNet', 2, {}),
    ('DCAN', 2, {}),
    ('FullNet', 2, {}),
    ('DIST', 2, {}),
    ('HoverNet', 2, {}),
]


@pytest.mark.parametrize('name,num_classes,extra', CASES, ids=[c[0] for c in CASES])
def test_segmentor_smoke(name, num_classes, extra):
    seg = build_segmentor(dict(type=name, num_classes=num_classes, train_cfg=dict(),
                               test_cfg=dict(mode='whole', radius=1, **extra)))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(HW, HW))

    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, HW, HW, 3)).astype(np.float32)) * 0.1
    heads = seg.forward_heads(variables, img)
    assert heads['sem'].shape[:3] == (2, HW, HW)

    batch = {'data': {'img': img}, 'label': synth_labels(np.random.default_rng(0))}

    def loss_fn(params):
        total, (logs, _) = seg.loss({'params': params, 'batch_stats': variables.get('batch_stats', {})},
                                    batch, rng=jax.random.PRNGKey(1))
        return total, logs

    (total, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables['params'])
    assert np.isfinite(float(total)), logs
    gnorm = jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(jnp.abs(x)), grads, 0.0)
    assert float(gnorm) > 0

    fused = jax.jit(seg.inference)(variables, img[:1])
    res = seg.postprocess({k: np.asarray(v[0]) for k, v in fused.items()})
    assert res['sem_pred'].shape == (HW, HW)
    assert res['inst_pred'].shape == (HW, HW)
    assert res['inst_pred'].dtype == np.int32
