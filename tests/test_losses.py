"""Unit tests for the jnp loss zoo against hand-computed values / invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.models import losses as L


def test_cross_entropy_matches_manual():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 3)).astype(np.float32))
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 3, (2, 4, 4)))
    got = float(L.cross_entropy(logits, labels))
    p = jax.nn.log_softmax(logits, axis=-1)
    want = -np.mean(np.take_along_axis(np.asarray(p), np.asarray(labels)[..., None], axis=-1))
    assert got == pytest.approx(want, rel=1e-5)


def test_cross_entropy_weight_map():
    logits = jnp.zeros((1, 2, 2, 2))
    labels = jnp.zeros((1, 2, 2), jnp.int32)
    w = jnp.asarray([[[2.0, 0.0], [0.0, 0.0]]])
    got = float(L.cross_entropy(logits, labels, weight=w))
    # uniform logits -> nll = log(2) everywhere; weighted mean = 2*log2/4
    assert got == pytest.approx(2 * np.log(2) / 4, rel=1e-5)


def test_dice_perfect_prediction_is_zero():
    labels = jnp.asarray(np.random.default_rng(2).integers(0, 3, (2, 8, 8)))
    logits = jax.nn.one_hot(labels, 3) * 100.0
    assert float(L.batch_multiclass_dice_loss(logits, labels, 3)) == pytest.approx(0.0, abs=1e-3)
    assert float(L.multiclass_dice_loss(logits, labels, 3)) == pytest.approx(0.0, abs=1e-3)


def test_tdice_mdice_bounds():
    labels = jnp.asarray(np.random.default_rng(3).integers(0, 2, (2, 16, 16)))
    logits = jax.nn.one_hot(labels, 2) * 10.0
    assert float(L.tdice(logits, labels, 2)) == pytest.approx(100.0, abs=1e-3)
    assert float(L.mdice(logits, labels, 2)) == pytest.approx(100.0, abs=1e-3)


def test_gradient_mse_zero_for_equal_maps():
    hv = jnp.asarray(np.random.default_rng(4).normal(size=(1, 16, 16, 2)).astype(np.float32))
    focus = jnp.ones((1, 16, 16))
    assert float(L.gradient_mse_loss(hv, hv, focus)) == pytest.approx(0.0, abs=1e-6)
    hv2 = hv + jnp.asarray(np.linspace(0, 1, 16, dtype=np.float32))[None, None, :, None]
    assert float(L.gradient_mse_loss(hv2, hv, focus)) > 0


def test_variance_loss_uniform_instance_zero():
    # uniform probabilities inside each instance -> zero variance
    logits = jnp.zeros((1, 8, 8, 2))
    inst = jnp.zeros((1, 8, 8), jnp.int32).at[:, 2:6, 2:6].set(1)
    assert float(L.variance_loss(logits, inst)) == pytest.approx(0.0, abs=1e-6)


def test_focal_reduces_easy_examples():
    labels = jnp.zeros((1, 8, 8), jnp.int32)
    easy = jax.nn.one_hot(labels, 2) * 10.0
    hard = jnp.zeros((1, 8, 8, 2))
    assert float(L.focal_loss(easy, labels)) < float(L.focal_loss(hard, labels))


def test_topological_loss_contour_band_only():
    dir_logits = jnp.asarray(np.random.default_rng(5).normal(size=(1, 8, 8, 9)).astype(np.float32))
    dir_gt = jnp.asarray(np.random.default_rng(6).integers(0, 9, (1, 8, 8)))
    no_contour = jnp.zeros((1, 8, 8), bool)
    full_contour = jnp.ones((1, 8, 8), bool)
    zero = float(L.topological_loss(dir_logits, dir_gt, no_contour, no_contour, num_angles=8))
    full = float(L.topological_loss(dir_logits, dir_gt, full_contour, full_contour, num_angles=8))
    assert zero == pytest.approx(0.0, abs=1e-6)
    assert full > 0


def test_active_contour_region_terms():
    target = jnp.zeros((1, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    good = target
    bad = 1.0 - target
    assert float(L.active_contour_loss(good, target)) < float(L.active_contour_loss(bad, target))


def test_surface_loss_prefers_correct_side():
    from tiseg_tpu.models.losses import one_hot2dist, surface_loss
    cmap = np.zeros((16, 16), np.int64)
    cmap[4:12, 4:12] = 1
    dist = one_hot2dist(cmap, 3)  # (C, H, W)
    dist = jnp.asarray(np.transpose(dist, (1, 2, 0)))[None]
    good = jax.nn.one_hot(jnp.asarray(cmap)[None], 3)
    bad = jax.nn.one_hot(jnp.asarray(1 - cmap)[None], 3)
    assert float(surface_loss(good, dist, idc=(1,))) < float(surface_loss(bad, dist, idc=(1,)))


def test_robust_focal_clamped():
    labels = jnp.zeros((1, 8, 8), jnp.int32)
    very_wrong = jax.nn.one_hot(1 - labels, 2) * 50.0  # p_t ~ 0 -> focus ~ 1
    plain = float(L.focal_loss(very_wrong, labels, gamma=2.0))
    robust = float(L.focal_loss(very_wrong, labels, gamma=2.0, robust=True))
    assert np.isfinite(plain) and np.isfinite(robust)
    assert robust <= plain * 2 + 1e-6
