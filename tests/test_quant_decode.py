"""Int8 quantized fast-path (quant_decode.py) mechanics.

Pins on CPU: (a) the module's bf16/f32 executor is bit-identical to the
shipped fast path (same algebra, just a pluggable conv site), (b) the
int8 path's logits stay close to the float path and agree on argmax
almost everywhere (8-bit rounding only), (c) calibration records a scale
for every quantized site.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiseg_tpu.models import build_segmentor
from tiseg_tpu.models.heads import quant_decode
from tiseg_tpu.models.heads.fast_decode import apply_fast_unet_head, apply_fast_vgg16

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def unet_prep():
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole')))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    # randomize BN stats so folding isn't hiding behind identity norms
    bs = jax.tree_util.tree_map(lambda a: a, variables['batch_stats'])

    def jitter(path, a):
        key = jax.random.PRNGKey(hash(jax.tree_util.keystr(path)) % (2**31))
        if path[-1].key == 'var':
            return a * jax.random.uniform(key, a.shape, minval=0.5, maxval=1.5)
        return a + jax.random.normal(key, a.shape) * 0.05

    variables = {'params': variables['params'],
                 'batch_stats': jax.tree_util.tree_map_with_path(jitter, bs)}
    prep = seg.prepare_inference(variables)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)) * 0.5
    return seg, prep, img


def test_float_executor_matches_shipped_fast_path(unet_prep):
    seg, prep, img = unet_prep
    dtype = seg.net.dtype
    want_feats = apply_fast_vgg16(prep['vgg'], img, dtype=dtype)
    want = apply_fast_unet_head(prep['head'], want_feats[-1], want_feats[:-1], dtype=dtype)
    got = quant_decode.apply_fast_unet_bf16(prep['vgg'], prep['head'], img, dtype=dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-5)


def test_calibration_covers_every_quantized_site(unet_prep):
    seg, prep, img = unet_prep
    scales = jax.jit(lambda im: quant_decode.calibrate(prep['vgg'], prep['head'], im, dtype=seg.net.dtype))(img)
    fpq = quant_decode.quantize_params(prep['vgg'], prep['head'], scales)
    assert set(fpq['wq']) <= set(fpq['act']), 'every weight site needs an activation scale'
    for k, v in fpq['act'].items():
        assert float(v) > 0
    # every int8 weight really is int8
    for k, (wq, sw) in fpq['wq'].items():
        assert wq.dtype == jnp.int8, k
        assert sw.ndim == 1
    # the plain (non-phase) decoder stages are sited too: UNet's default
    # phase prefix is {0, 1}, so stages 2..4 carry dec{i}.pt / dec{i}.pc
    for i in (2, 3, 4):
        assert f'dec{i}.pt' in fpq['wq'], f'plain tconv site dec{i}.pt missing'
        assert f'dec{i}.pc' in fpq['wq'], f'plain concat-conv site dec{i}.pc missing'
    assert quant_decode._plain_sites_ok(fpq, 1, 5)


def test_int8_close_to_float_and_argmax_agrees(unet_prep):
    seg, prep, img = unet_prep
    dtype = seg.net.dtype
    scales = quant_decode.calibrate(prep['vgg'], prep['head'], img, dtype=dtype)
    fpq = quant_decode.quantize_params(prep['vgg'], prep['head'], scales)
    want = np.asarray(quant_decode.apply_fast_unet_bf16(prep['vgg'], prep['head'], img,
                                                        dtype=dtype), np.float32)
    got = np.asarray(jax.jit(lambda im: quant_decode.apply_fast_unet_q(
        prep['vgg'], prep['head'], fpq, im, dtype=dtype))(img), np.float32)
    assert got.shape == want.shape
    # 8-bit rounding: loose elementwise band relative to the logit range
    rng_ = float(want.max() - want.min())
    assert float(np.abs(got - want).max()) < 0.25 * rng_ + 1e-3
    agree = float((got.argmax(-1) == want.argmax(-1)).mean())
    assert agree > 0.98, f'argmax agreement {agree}'


def test_int8_resident_matches_dequant_path(unet_prep):
    """The int8-RESIDENT executor (activations materialized int8 between
    convs) quantizes at the same sites/scales as apply_fast_unet_q; its
    logits must track the dequant-per-site path to within the f32-vs-bf16
    pre-quantization rounding (1 int8 LSB through the final bf16 stages),
    with near-total argmax agreement."""
    seg, prep, img = unet_prep
    dtype = seg.net.dtype
    scales = quant_decode.calibrate(prep['vgg'], prep['head'], img, dtype=dtype)
    fpq = quant_decode.quantize_params(prep['vgg'], prep['head'], scales)
    assert quant_decode.resident_ok(prep['head'])
    q = np.asarray(jax.jit(lambda im: quant_decode.apply_fast_unet_q(
        prep['vgg'], prep['head'], fpq, im, dtype=dtype))(img), np.float32)
    q8 = np.asarray(jax.jit(lambda im: quant_decode.apply_fast_unet_q8(
        prep['vgg'], prep['head'], fpq, im, dtype=dtype))(img), np.float32)
    assert q8.shape == q.shape
    rng_ = float(q.max() - q.min())
    assert float(np.abs(q8 - q).max()) < 0.05 * rng_ + 1e-3
    agree = float((q8.argmax(-1) == q.argmax(-1)).mean())
    assert agree > 0.995, f'argmax agreement {agree}'


def test_int8_resident_rejects_unsupported_layout(unet_prep):
    """Non-prefix phase layouts fall back (ValueError) rather than
    silently running a wrong site map."""
    seg, prep, img = unet_prep
    # phase stage set {0} with no plain stage above it -> rejected
    solo = {'stages': {0: dict(prep['head']['stages'][0])},
            'cls_kernel': prep['head']['cls_kernel'], 'cls_bias': prep['head']['cls_bias']}
    assert not quant_decode.resident_ok(solo)
    with pytest.raises(ValueError):
        quant_decode.apply_fast_unet_q8(prep['vgg'], solo, {}, img)


def test_int8_e2e_wiring():
    """test_cfg['int8_eval'] + calibrate_int8 routes the fused eval program
    through the quantized convs; uncalibrated it stays on bf16; predictions
    agree with the float program almost everywhere."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)) * 0.5
    cfg = dict(type='UNet', num_classes=2, train_cfg=dict(),
               test_cfg=dict(mode='whole', device_postprocess=True, radius=1, int8_eval=True))
    seg = build_segmentor(cfg)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    # uncalibrated: prep has no int8 tree
    assert 'int8' not in (seg.prepare_inference(variables) or {})
    base = jax.jit(lambda v, im: seg.inference_and_postprocess(v, im))(variables, img)
    seg.calibrate_int8(variables, img)
    assert 'int8' in seg.prepare_inference(variables)
    quant = jax.jit(lambda v, im: seg.inference_and_postprocess(v, im))(variables, img)
    # a random-init net has near-zero logit margins, so 8-bit rounding flips
    # argmax at no-margin pixels freely (the trained-workload agreement is
    # 99.8%+, bench_int8). Pin instead: where the float program has a real
    # margin, the int8 program agrees.
    prep = seg.prepare_inference(variables)
    prep_bf = {k: v for k, v in prep.items() if k != 'int8'}
    logits = np.asarray(jax.jit(lambda v, im: seg.forward_heads(v, im, prep=prep_bf)['sem'])(
        variables, img), np.float32)
    logits_q = np.asarray(jax.jit(lambda v, im: seg.forward_heads(v, im, prep=prep)['sem'])(
        variables, img), np.float32)
    # raw argmax at confident pixels must agree (post-proc amplifies single-
    # pixel flips into region-level sem_pred changes, so it gets a loose pin)
    margin = np.abs(logits[..., 1] - logits[..., 0])
    confident = margin > 0.1 * float(margin.max())
    raw_same = logits.argmax(-1) == logits_q.argmax(-1)
    agree_conf = float(raw_same[confident].mean())
    assert agree_conf > 0.995, agree_conf
    same = np.asarray(base['sem_pred']) == np.asarray(quant['sem_pred'])
    assert float(same.mean()) > 0.9


def test_q8_pred_plane_matches_logits_argmax(unet_prep):
    """out='pred' (argmax in the phase layout, logits never at full res)
    is BIT-identical to argmax(d2s(logits)) — same arithmetic up to the
    argmax, which commutes with the d2s permutation."""
    seg, prep, img = unet_prep
    dtype = seg.net.dtype
    scales = jax.jit(lambda im: quant_decode.calibrate(prep['vgg'], prep['head'], im,
                                                       dtype=dtype))(img)
    fpq = quant_decode.quantize_params(prep['vgg'], prep['head'], jax.device_get(scales))
    logits = jax.jit(lambda im: quant_decode.apply_fast_unet_q8(
        prep['vgg'], prep['head'], fpq, im, dtype=dtype))(img)
    pred = jax.jit(lambda im: quant_decode.apply_fast_unet_q8(
        prep['vgg'], prep['head'], fpq, im, dtype=dtype, out='pred'))(img)
    assert pred.shape == img.shape[:3] and pred.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(logits).argmax(-1))


def test_alias_pairs_share_one_scale(unet_prep):
    """Dual-consumer emissions (stage output -> decoder skip + next-stage
    pool) are pinned to ONE scale so the resident executor materializes a
    single int8 copy."""
    seg, prep, img = unet_prep
    dtype = seg.net.dtype
    scales = jax.jit(lambda im: quant_decode.calibrate(prep['vgg'], prep['head'], im,
                                                       dtype=dtype))(img)
    fpq = quant_decode.quantize_params(prep['vgg'], prep['head'], jax.device_get(scales))
    pairs = quant_decode._alias_pairs(fpq['act'])
    assert ('dec0.cs_phase', 's1c0') in pairs
    for a, b in pairs:
        assert float(fpq['act'][a]) == float(fpq['act'][b])
