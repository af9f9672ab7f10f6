"""Parity: fused decode0+cls Pallas kernel vs the XLA phase path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.models.heads import fast_decode as fd
from tiseg_tpu.attic.pallas_decode import fused_decode0_cls

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


def _random_stage(rng, G, Cx, C0, F_t, F_c, nc, dtype):
    def r(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.2, dtype)

    kt = r(4, 4, Cx, F_t)            # flax ConvTranspose kernel
    bt = r(F_t)
    kc = r(3, 3, F_t + C0, F_c)      # decode conv (t || skip concat)
    bc = r(F_c)
    Wt, bt_ = fd.phase_tconv_weights(kt, bt)
    st = {'Wt': Wt.astype(dtype), 'bt': bt_.astype(dtype),
          'Wc_t': fd.block_conv_t_weights(kc[:, :, :F_t, :], F_t).astype(dtype),
          'Wc_s_phase': fd.block_conv_t_weights(kc[:, :, F_t:, :], C0).astype(dtype),
          'bc': jnp.tile(bc, 4).astype(dtype)}
    cls_k = r(1, 1, F_c, nc)
    cls_b = r(nc)
    return st, cls_k, cls_b


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_fused_decode0_cls_matches_phase_path(dtype):
    rng = np.random.default_rng(0)
    G, Cx, C0, F_t, F_c, nc, B = 32, 8, 16, 8, 16, 2, 2
    st, cls_k, cls_b = _random_stage(rng, G, Cx, C0, F_t, F_c, nc, dtype)

    x = jnp.asarray(rng.normal(size=(B, G, G, Cx)).astype(np.float32), dtype)
    z = jnp.asarray(rng.normal(size=(B, G + 1, G + 1, 4 * C0)).astype(np.float32), dtype)
    z = fd._mask_edges_flat(z, C0)
    skip = fd.PhaseSkip(z, C0)

    # reference: existing XLA phase path + cls + d2s
    phase_out = fd._apply_stage_phase(st, x, skip, dtype)
    Bq, Hb, Wb, C4 = phase_out.shape
    y = phase_out.reshape(Bq, Hb, Wb, 4, C4 // 4) @ cls_k[0, 0].astype(dtype) + cls_b.astype(dtype)
    ref = fd.d2s(y.reshape(Bq, Hb, Wb, 4 * nc), nc)

    got = fused_decode0_cls(x, z, st['Wt'], st['bt'], st['Wc_t'],
                            st['Wc_s_phase'], st['bc'], cls_k, cls_b, dtype=dtype)

    assert got.shape == ref.shape == (B, 2 * G, 2 * G, nc)
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32)))
    tol = 1e-4 if dtype == jnp.float32 else 0.15
    assert err < tol, f'max err {err}'


def test_fused_decode0_cls_non_pow2_grid():
    """G=24 (not a multiple of 32): whole-image kernel handles any grid."""
    rng = np.random.default_rng(1)
    dtype = jnp.float32
    G = 24
    st, cls_k, cls_b = _random_stage(rng, G, 8, 16, 8, 16, 2, dtype)
    x = jnp.asarray(rng.normal(size=(1, G, G, 8)).astype(np.float32), dtype)
    z = jnp.asarray(rng.normal(size=(1, G + 1, G + 1, 64)).astype(np.float32), dtype)
    z = fd._mask_edges_flat(z, 16)
    skip = fd.PhaseSkip(z, 16)
    phase_out = fd._apply_stage_phase(st, x, skip, dtype)
    Bq, Hb, Wb, C4 = phase_out.shape
    y = phase_out.reshape(Bq, Hb, Wb, 4, C4 // 4) @ cls_k[0, 0] + cls_b
    ref = fd.d2s(y.reshape(Bq, Hb, Wb, 4 * 2), 2)
    got = fused_decode0_cls(x, z, st['Wt'], st['bt'], st['Wc_t'],
                            st['Wc_s_phase'], st['bc'], cls_k, cls_b, dtype=dtype)
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32)))
    assert err < 1e-4, f'max err {err}'
