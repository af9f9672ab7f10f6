"""Phase-space fast eval path (fast_decode) must match the flax eval path.

The rewrites are exact algebra (s2d folded into conv strides/kernels, BN
folded into weights); any divergence beyond f32 accumulation noise is a
bug. Perturbed BN stats + params make sure no term is hidden by
zero-initialized scales or ReLU-saturated edges (a real bug class: the
tconv's out-of-image phase rows must be masked, which default-init BN
accidentally hides).
"""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from tiseg_tpu.models import build_segmentor

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow

RTOL = 3e-5


def _perturbed(seg, seed=0, hw=(64, 64)):
    rng = np.random.default_rng(seed)
    v = seg.init_variables(jax.random.PRNGKey(0), hw=hw)

    def stats(path, l):
        if 'mean' in jtu.keystr(path):
            return jnp.asarray(rng.normal(size=l.shape).astype(np.float32)) * 0.02
        return jnp.abs(jnp.asarray(rng.normal(size=l.shape).astype(np.float32)) * 0.1) + 0.9

    p = jtu.tree_map(lambda l: l + jnp.asarray(rng.normal(size=l.shape).astype(np.float32)) * 0.02,
                     v['params'])
    return {'params': p, 'batch_stats': jtu.tree_map_with_path(stats, v['batch_stats'])}


@pytest.mark.parametrize('typ', ['UNet', 'CUNet'])
def test_fast_eval_matches_flax(typ):
    seg = build_segmentor(dict(type=typ, num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    v = _perturbed(seg)
    img = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(np.float32))
    seg.test_cfg['fast_eval'] = False
    ref = seg.forward_heads(v, img)['sem']
    seg.test_cfg['fast_eval'] = True
    got = seg.forward_heads(v, img)['sem']
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(ref - got).max()) < RTOL * max(scale, 1.0)


def test_fast_eval_prep_through_jit():
    """prep must be a pure array pytree usable as a jit argument."""
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    v = _perturbed(seg)
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32))
    prep = jax.jit(seg.prepare_inference)(v)
    got = jax.jit(lambda v, img, prep: seg.forward_heads(v, img, prep=prep)['sem'])(v, img, prep)
    seg.test_cfg['fast_eval'] = False
    ref = seg.forward_heads(v, img)['sem']
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(ref - got).max()) < RTOL * max(scale, 1.0)


def test_fast_eval_odd_size_falls_back():
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    v = _perturbed(seg, hw=(64, 64))
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 66, 66, 3)).astype(np.float32))
    out = seg.forward_heads(v, img)['sem']
    assert out.shape == (1, 66, 66, 2)


def test_fast_eval_used_in_inference_tta():
    """inference() (TTA fusion) must agree between fast and flax paths."""
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', rotate_degrees=[0, 90],
                                             flip_directions=['none', 'horizontal'])))
    v = _perturbed(seg)
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32))
    got = seg.inference(v, img)['sem']
    seg.test_cfg['fast_eval'] = False
    ref = seg.inference(v, img)['sem']
    assert float(jnp.abs(ref - got).max()) < RTOL

def test_training_unaffected_by_fast_flag():
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    v = _perturbed(seg)
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32))
    out = seg.forward_heads(v, img, train=True, rng=jax.random.PRNGKey(0), mutable=True)
    assert isinstance(out, tuple) and 'sem' in out[0]
