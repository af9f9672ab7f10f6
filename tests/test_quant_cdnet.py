"""Int8 CDNet eval path (heads/quant_cdnet.py) mechanics.

Pins on CPU: (a) the folded bf16/f32 executor matches the flax eval
forward (BN folding is exact affine algebra; f32 tolerance only), (b)
the int8 path stays close to the float executor and agrees on the sem
argmax almost everywhere, (c) calibration covers every quantized site,
(d) the segmentor-level opt-in routes inference through the quantized
program and keeps output contracts intact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiseg_tpu.models import build_segmentor
from tiseg_tpu.models.heads import quant_cdnet

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def cdnet_prep():
    seg = build_segmentor(dict(type='CDNet', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole')))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))

    def jitter(path, a):
        key = jax.random.PRNGKey(hash(jax.tree_util.keystr(path)) % (2**31))
        if path[-1].key == 'var':
            return a * jax.random.uniform(key, a.shape, minval=0.5, maxval=1.5)
        return a + jax.random.normal(key, a.shape) * 0.05

    variables = {'params': variables['params'],
                 'batch_stats': jax.tree_util.tree_map_with_path(jitter, variables['batch_stats'])}
    fp = quant_cdnet.build_cdnet_fp(variables['params'], variables['batch_stats'],
                                    dtype=seg.net.dtype)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)) * 0.5
    return seg, variables, fp, img


def test_folded_executor_matches_flax_forward(cdnet_prep):
    seg, variables, fp, img = cdnet_prep
    want = seg.net.apply(variables, img, False)
    got = quant_cdnet.apply_cdnet_bf16(fp, img, dtype=seg.net.dtype)
    for k in ('sem', 'dir', 'point'):
        np.testing.assert_allclose(np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
                                   rtol=0, atol=2e-4, err_msg=k)


def test_calibration_covers_every_quantized_site(cdnet_prep):
    seg, variables, fp, img = cdnet_prep
    scales = jax.jit(lambda im: quant_cdnet.calibrate(fp, im, dtype=seg.net.dtype))(img)
    fpq = quant_cdnet.quantize_params(fp, scales)
    assert set(fpq['wq']) <= set(fpq['act'])
    # 13 VGG + 5 tconv + 5 decoder convs + 6 DGM residual convs, plus the
    # resident-only sites: 3 RU identity 1x1s + 3 head 1x1s
    assert len(fpq['wq']) == 13 + 5 + 5 + 6 + 3 + 3
    for k, (wq, sw) in fpq['wq'].items():
        assert wq.dtype == jnp.int8, k
        assert sw.ndim == 1


def test_int8_close_to_float_and_argmax_agrees(cdnet_prep):
    seg, variables, fp, img = cdnet_prep
    dtype = seg.net.dtype
    scales = quant_cdnet.calibrate(fp, img, dtype=dtype)
    fpq = quant_cdnet.quantize_params(fp, scales)
    want = quant_cdnet.apply_cdnet_bf16(fp, img, dtype=dtype)
    got = jax.jit(lambda im: quant_cdnet.apply_cdnet_q(fp, fpq, im, dtype=dtype))(img)
    for k in ('sem', 'dir', 'point'):
        w = np.asarray(want[k], np.float32)
        g = np.asarray(got[k], np.float32)
        assert g.shape == w.shape
        rng_ = float(w.max() - w.min())
        assert float(np.abs(g - w).max()) < 0.25 * rng_ + 1e-3, k
    agree = float((np.asarray(got['sem']).argmax(-1) == np.asarray(want['sem']).argmax(-1)).mean())
    assert agree > 0.97, f'sem argmax agreement {agree}'


def test_int8_resident_matches_dequant_path(cdnet_prep):
    """apply_cdnet_q8 (activations stay int8 between convs, int8 1x1 heads via
    the gate-commutation rewrite) stays close to both the dequant int8 path
    and the float executor, and agrees with the float argmax."""
    seg, variables, fp, img = cdnet_prep
    dtype = seg.net.dtype
    scales = quant_cdnet.calibrate(fp, img, dtype=dtype)
    fpq = quant_cdnet.quantize_params(fp, scales)
    assert quant_cdnet.resident_ok(fpq)
    want = quant_cdnet.apply_cdnet_bf16(fp, img, dtype=dtype)
    got_q = jax.jit(lambda im: quant_cdnet.apply_cdnet_q(fp, fpq, im, dtype=dtype))(img)
    got_q8 = jax.jit(lambda im: quant_cdnet.apply_cdnet_q8(fp, fpq, im, dtype=dtype))(img)
    for k in ('sem', 'dir', 'point'):
        w = np.asarray(want[k], np.float32)
        g8 = np.asarray(got_q8[k], np.float32)
        assert g8.shape == w.shape
        rng_ = float(w.max() - w.min())
        assert float(np.abs(g8 - w).max()) < 0.25 * rng_ + 1e-3, k
        # and close to the dequant int8 path (same sites/scales; the only new
        # quantizations are the 1x1 identity/head convs)
        gq = np.asarray(got_q[k], np.float32)
        assert float(np.abs(g8 - gq).max()) < 0.15 * rng_ + 1e-3, k
    agree = float((np.asarray(got_q8['sem']).argmax(-1) == np.asarray(want['sem']).argmax(-1)).mean())
    assert agree > 0.97, f'sem argmax agreement {agree}'


def test_resident_requires_resident_sites(cdnet_prep):
    seg, variables, fp, img = cdnet_prep
    scales = quant_cdnet.calibrate(fp, img, dtype=seg.net.dtype)
    scales = {k: v for k, v in scales.items() if k != 'point_conv'}  # older calibration
    fpq = quant_cdnet.quantize_params(fp, scales)
    assert not quant_cdnet.resident_ok(fpq)
    with pytest.raises(ValueError):
        quant_cdnet.apply_cdnet_q8(fp, fpq, img, dtype=seg.net.dtype)


def test_segmentor_opt_in_routes_inference(cdnet_prep):
    seg, variables, fp, img = cdnet_prep
    seg.calibrate_int8(variables, img)
    seg.test_cfg['int8_eval'] = True
    try:
        fused = jax.jit(lambda v, im: seg.inference(v, im))(variables, img)
        assert fused['sem'].shape == (2, 64, 64, 3)
        # quantized inference argmax tracks the default flax route
        seg.test_cfg['int8_eval'] = False
        base = jax.jit(lambda v, im: seg.inference(v, im))(variables, img)
        agree = float((np.asarray(fused['sem']).argmax(-1) == np.asarray(base['sem']).argmax(-1)).mean())
        assert agree > 0.95, agree
    finally:
        seg.test_cfg['int8_eval'] = False


def test_non_divisible_shape_pads_like_flax(cdnet_prep):
    seg, variables, fp, img = cdnet_prep
    rng = np.random.default_rng(1)
    odd = jnp.asarray(rng.normal(size=(1, 100, 100, 3)).astype(np.float32)) * 0.5
    want = seg.net.apply(variables, odd, False)
    got = quant_cdnet.apply_cdnet_bf16(fp, odd, dtype=seg.net.dtype)
    np.testing.assert_allclose(np.asarray(got['sem'], np.float32),
                               np.asarray(want['sem'], np.float32), rtol=0, atol=2e-4)
