"""Int8 HoverNet eval path (heads/quant_hovernet.py) mechanics.

Pins on CPU: (a) the folded bf16/f32 executor matches the flax eval
forward (backbone BN folding is exact affine algebra; decoder pre-act
BNs become explicit affines), (b) the int8 path stays close to the
float executor and agrees on the sem argmax almost everywhere, (c)
calibration covers every quantized site, (d) the segmentor-level opt-in
routes inference through the quantized program and keeps output
contracts intact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiseg_tpu.models import build_segmentor
from tiseg_tpu.models.heads import quant_hovernet

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def hovernet_prep():
    seg = build_segmentor(dict(type='HoverNet', num_classes=3, train_cfg=dict(),
                               test_cfg=dict(mode='whole')))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))

    def jitter(path, a):
        key = jax.random.PRNGKey(hash(jax.tree_util.keystr(path)) % (2**31))
        if path[-1].key == 'var':
            return a * jax.random.uniform(key, a.shape, minval=0.5, maxval=1.5)
        return a + jax.random.normal(key, a.shape) * 0.05

    variables = {'params': variables['params'],
                 'batch_stats': jax.tree_util.tree_map_with_path(jitter, variables['batch_stats'])}
    fp = quant_hovernet.build_hovernet_fp(variables['params'], variables['batch_stats'],
                                          dtype=seg.net.dtype)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)) * 0.5
    return seg, variables, fp, img


def test_folded_executor_matches_flax_forward(hovernet_prep):
    seg, variables, fp, img = hovernet_prep
    want = seg.net.apply(variables, img, False)
    got = quant_hovernet.apply_hovernet_bf16(fp, img, dtype=seg.net.dtype)
    for k in ('sem', 'fore', 'hv'):
        # output dtype contract: f32 like flax u0_cls (device post-proc
        # sobel requires it)
        assert got[k].dtype == want[k].dtype, k
        np.testing.assert_allclose(np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
                                   rtol=0, atol=5e-4, err_msg=k)


def test_calibration_covers_every_quantized_site(hovernet_prep):
    seg, variables, fp, img = hovernet_prep
    scales = jax.jit(lambda im: quant_hovernet.calibrate(fp, im, dtype=seg.net.dtype))(img)
    fpq = quant_hovernet.quantize_params(fp, scales)
    assert set(fpq['wq']) <= set(fpq['act'])
    # stem + 16 bottlenecks x 3 + 4 downsamples + conv_bot
    #  + 2 int8 branches x (u3a + 8x2 dense + u3f + u2a + 4x2 dense + u2f + u1a
    #  + u0_cls) — the hv branch is a float_branches exemption (regression
    #  output is int8-resolution-sensitive; see quant_hovernet.quantize_params)
    assert len(fpq['wq']) == 1 + 48 + 4 + 1 + 2 * (1 + 16 + 1 + 1 + 8 + 1 + 1 + 1)
    assert not any(k.startswith('hv.') for k in fpq['wq'])
    # resident-branch emission sites (act-only: concat segments + block inputs + u0)
    for nm in ('tp', 'np', 'hv'):
        for lvl, units in (('u3', 8), ('u2', 4)):
            assert f'{nm}.{lvl}in' in fpq['act']
            for u in range(units):
                assert f'{nm}.{lvl}d{u}y' in fpq['act']
        assert f'{nm}.u0' in fpq['act']
    for k, (wq, sw) in fpq['wq'].items():
        assert wq.dtype == jnp.int8, k
        assert sw.ndim == 1


def test_int8_close_to_float_and_argmax_agrees(hovernet_prep):
    seg, variables, fp, img = hovernet_prep
    dtype = seg.net.dtype
    scales = quant_hovernet.calibrate(fp, img, dtype=dtype)
    fpq = quant_hovernet.quantize_params(fp, scales)
    want = quant_hovernet.apply_hovernet_bf16(fp, img, dtype=dtype)
    got = jax.jit(lambda im: quant_hovernet.apply_hovernet_q(fp, fpq, im, dtype=dtype))(img)
    for k in ('sem', 'fore', 'hv'):
        w = np.asarray(want[k], np.float32)
        g = np.asarray(got[k], np.float32)
        assert g.shape == w.shape
        rng_ = float(w.max() - w.min())
        assert float(np.abs(g - w).max()) < 0.25 * rng_ + 1e-3, k
    agree = float((np.asarray(got['sem']).argmax(-1) == np.asarray(want['sem']).argmax(-1)).mean())
    assert agree > 0.95, f'sem argmax agreement {agree}'


def test_int8_backbone_resident_matches_dequant_path(hovernet_prep):
    """apply_hovernet_q8 (trunk activations stay int8 between convs; identity
    residuals read the dequantized int8 copy) stays close to both the dequant
    int8 path and the float executor, and agrees with the float argmax."""
    seg, variables, fp, img = hovernet_prep
    dtype = seg.net.dtype
    scales = quant_hovernet.calibrate(fp, img, dtype=dtype)
    fpq = quant_hovernet.quantize_params(fp, scales)
    want = quant_hovernet.apply_hovernet_bf16(fp, img, dtype=dtype)
    got_q = jax.jit(lambda im: quant_hovernet.apply_hovernet_q(fp, fpq, im, dtype=dtype))(img)
    got_q8 = jax.jit(lambda im: quant_hovernet.apply_hovernet_q8(fp, fpq, im, dtype=dtype))(img)
    for k in ('sem', 'fore', 'hv'):
        w = np.asarray(want[k], np.float32)
        g8 = np.asarray(got_q8[k], np.float32)
        assert g8.shape == w.shape
        rng_ = float(w.max() - w.min())
        assert float(np.abs(g8 - w).max()) < 0.25 * rng_ + 1e-3, k
        gq = np.asarray(got_q[k], np.float32)
        assert float(np.abs(g8 - gq).max()) < 0.15 * rng_ + 1e-3, k
    agree = float((np.asarray(got_q8['sem']).argmax(-1) == np.asarray(want['sem']).argmax(-1)).mean())
    assert agree > 0.95, f'sem argmax agreement {agree}'


def test_segmentor_opt_in_routes_inference(hovernet_prep):
    seg, variables, fp, img = hovernet_prep
    seg.test_cfg['int8_eval'] = True
    try:
        assert seg.prepare_inference(variables) is None  # uncalibrated: bf16
        seg.calibrate_int8(variables, img)
        prep = seg.prepare_inference(variables)
        assert prep is not None and 'int8' in prep
        fused = seg.inference(variables, img)
        assert fused['sem'].shape == (2, 64, 64, 3)
        assert fused['hv'].shape == (2, 64, 64, 2)
        # routed output == direct resident executor (whole mode, 1 view)
        direct = quant_hovernet.apply_hovernet_q8(fp, seg._int8_fpq, img, dtype=seg.net.dtype)
        want = jax.nn.softmax(direct['sem'], axis=-1)
        np.testing.assert_allclose(np.asarray(fused['sem'], np.float32),
                                   np.asarray(want, np.float32), rtol=0, atol=1e-5)
    finally:
        seg.test_cfg['int8_eval'] = False
        seg._int8_fpq = None
