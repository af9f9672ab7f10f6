"""Full-model numerical parity vs the PyTorch reference.

Identical weights are copied from a reference model (random init, BN
params/stats randomized so nothing hides behind identity norms) into the
Flax model via tiseg_tpu.utils.torch_import; eval-mode forward logits
must agree to f32 tolerance. This pins BN semantics, padding
conventions, transposed-conv orientation, and DGM wiring end-to-end
(SURVEY §7 risks; VERDICT round-1 item 4).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiseg_tpu.models import build_segmentor
from tiseg_tpu.utils.torch_import import import_reference_checkpoint

torch = pytest.importorskip('torch')

from reference_compat import load_reference_models  # noqa: E402

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow

RTOL = 2e-4


def _randomize_torch(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.weight.copy_(torch.rand(mod.weight.shape, generator=g) * 0.5 + 0.75)
                mod.bias.copy_(torch.randn(mod.bias.shape, generator=g) * 0.2)
                mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=g) * 0.05)
                mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) * 0.3 + 0.85)


def _compare(typ, ref_cfg=None, heads=1, hw=64, extra=None, head_order=None, batch=2):
    load_reference_models()
    from tiseg.models import build_segmentor as ref_build

    cfg = dict(type=typ, num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole'))
    cfg.update(extra or {})
    ref_cfg = dict(cfg, **(ref_cfg or {}))
    ref_cfg.setdefault('pretrained', None)
    try:
        ref = ref_build(ref_cfg)
    except TypeError:
        ref_cfg.pop('pretrained')
        ref = ref_build(ref_cfg)
    ref.eval()
    _randomize_torch(ref)

    seg = build_segmentor(cfg)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(hw, hw))
    variables = import_reference_checkpoint(typ, variables, ref.state_dict())

    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, hw, hw, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.calculate(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = [want] if not isinstance(want, (list, tuple)) else list(want)
    want = [w.numpy().transpose(0, 2, 3, 1) for w in want]

    got = seg.forward_heads(variables, jnp.asarray(x))
    got = [np.asarray(got[k]) for k in head_order] if head_order else [np.asarray(v) for v in got.values()]
    assert len(got) == len(want) == heads
    for g, w in zip(got, want):
        scale = max(float(np.abs(w).max()), 1.0)
        err = float(np.abs(g - w).max())
        assert err < RTOL * scale, f'{typ}: err {err} vs scale {scale}'


def test_unet_parity():
    _compare('UNet', ref_cfg=dict())


def test_cunet_parity():
    _compare('CUNet')


def test_cdnet_parity():
    _compare('CDNet', heads=3)


def test_hovernet_parity():
    # reference calculate returns (sem, hv, fore) (hovernet.py:225-233)
    _compare('HoverNet', heads=3, head_order=('sem', 'hv', 'fore'))


def test_dcan_parity():
    # reference calculate returns (cell_logit, cont_logit) (dcan.py:124-157)
    _compare('DCAN', heads=2, head_order=('sem', 'cont'))


def test_dist_parity():
    # reference calculate returns (sem_logit, dist_logit) (dist.py:210-245)
    _compare('DIST', heads=2, head_order=('sem', 'dist'))


def test_micronet_parity():
    # valid convolutions pin the input to 252x252 (micronet.py:96-99)
    _compare('MicroNet', hw=252, batch=1)


def test_cmicronet_parity():
    _compare('CMicroNet', hw=252, batch=1)


def test_fullnet_parity():
    _compare('FullNet')


def test_multi_task_unet_parity():
    # reference calculate returns (inner_logit, sem_logit) (multi_task_unet.py:38-46)
    _compare('MultiTaskUNet', heads=2, head_order=('aux', 'sem'))


def test_multi_task_cunet_parity():
    # reference calculate returns (tc_logit, sem_logit) (multi_task_cunet.py:38-46)
    _compare('MultiTaskCUNet', heads=2, head_order=('aux', 'sem'))


def test_multi_task_cunet_debug_parity():
    _compare('MultiTaskCUNetDebug', heads=2, head_order=('aux', 'sem'))


_MTCD_ORDER = ('tc', 'sem', 'dir', 'point')


def test_multi_task_cdnet_parity():
    # reference calculate returns (tc, sem, dir, point) (multi_task_cdnet.py:146-153)
    _compare('MultiTaskCDNet', heads=4, head_order=_MTCD_ORDER)


def test_multi_task_cdnet_parallel_parity():
    _compare('MultiTaskCDNet', heads=4, head_order=_MTCD_ORDER,
             extra=dict(train_cfg=dict(parallel=True)))


def test_multi_task_cdnet_twobranch_parity():
    _compare('MultiTaskCDNet', heads=4, head_order=_MTCD_ORDER,
             extra=dict(train_cfg=dict(use_twobranch=True)))


def test_multi_task_cdnet_noau_regression_parity():
    _compare('MultiTaskCDNet', heads=4, head_order=_MTCD_ORDER,
             extra=dict(train_cfg=dict(noau=True, use_regression=True)))


def test_multi_task_cdnet_debug_parity():
    _compare('MultiTaskCDNetDebug', heads=4, head_order=_MTCD_ORDER)


def test_unet_parity_fast_eval_path():
    """The phase-space fast path must ALSO match the torch reference."""
    load_reference_models()
    from tiseg.models import build_segmentor as ref_build
    cfg = dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole'))
    ref = ref_build(dict(cfg))
    ref.eval()
    _randomize_torch(ref, seed=3)
    seg = build_segmentor(cfg)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    variables = import_reference_checkpoint('UNet', variables, ref.state_dict())
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.calculate(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    seg.test_cfg['fast_eval'] = True
    got = np.asarray(seg.forward_heads(variables, jnp.asarray(x))['sem'])
    assert float(np.abs(got - want).max()) < RTOL * max(float(np.abs(want).max()), 1.0)
