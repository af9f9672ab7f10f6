"""torchvision weight import: layout mapping onto the Flax VGG tree."""
import jax
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from tiseg_tpu.models import build_segmentor
from tiseg_tpu.models.backbones.torch_port import load_torchvision_vgg

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow

VGG16_CHANS = {0: (3, 64), 3: (64, 64), 7: (64, 128), 10: (128, 128), 14: (128, 256), 17: (256, 256),
               20: (256, 256), 24: (256, 512), 27: (512, 512), 30: (512, 512), 34: (512, 512),
               37: (512, 512), 40: (512, 512)}


def fake_state_dict():
    sd = {}
    for fid, (i, o) in VGG16_CHANS.items():
        sd[f'features.{fid}.weight'] = torch.randn(o, i, 3, 3)
        for key in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'features.{fid + 1}.{key}'] = torch.randn(o).abs()
    return sd


def test_vgg16_port_shapes_and_values():
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict()))
    v = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    sd = fake_state_dict()
    out = load_torchvision_vgg(v['params'], v['batch_stats'], state_dict=sd)
    assert out is not None
    params, stats = out
    # OIHW -> HWIO for the first conv
    want = sd['features.0.weight'].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(params['backbone']['stage0_conv0']['Conv_0']['kernel']), want)
    np.testing.assert_array_equal(np.asarray(stats['backbone']['stage4_conv2']['BatchNorm_0']['mean']),
                                  sd['features.41.running_mean'].numpy())
    # the net still applies cleanly with ported weights
    import jax.numpy as jnp
    heads = seg.forward_heads({'params': params, 'batch_stats': stats}, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(heads['sem'])).all()


def test_vgg16_port_feature_parity_vs_torchvision_arch():
    """Real-weight validation (SURVEY §7 risk #4): a torchvision-layout
    vgg16_bn state dict WITH conv biases ported into the Flax backbone must
    reproduce every pyramid level of the torch forward (the biases fold
    into the BN means)."""
    import jax.numpy as jnp
    from reference_compat import _vgg16_bn
    from tiseg_tpu.models.backbones.vgg import VGG16BN

    tv = _vgg16_bn()
    tv.eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) * 0.5 + 0.75)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.2)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.05)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.3 + 0.85)

    bb = VGG16BN()
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = load_torchvision_vgg({'backbone': v['params']}, {'backbone': v['batch_stats']},
                               state_dict=tv.state_dict())
    assert out is not None
    params, stats = out

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    got = bb.apply({'params': params['backbone'], 'batch_stats': stats['backbone']},
                   jnp.asarray(x), train=False)
    # torch forward, tapping the reference's stage boundaries
    taps = (5, 12, 22, 32, 42, 43)
    feats, t = [], torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for i, mod in enumerate(tv.features):
            t = mod(t)
            if i in taps:
                feats.append(t.numpy().transpose(0, 2, 3, 1))
    for i, (gg, ww) in enumerate(zip(got, feats)):
        err = float(np.abs(np.asarray(gg) - ww).max())
        assert err < 2e-4 * max(float(np.abs(ww).max()), 1.0), f'stage {i}: {err}'


def test_resnet50_port_feature_parity_vs_torchvision_arch():
    """torchvision-layout resnet50 state dict ported into the Flax
    TorchResNet must reproduce all four stage outputs (reference analog:
    torch_resnet.py pretrained=True)."""
    import jax.numpy as jnp
    from reference_compat import Bottleneck as TVBottleneck, ResNet as TVResNet
    from tiseg_tpu.models.backbones.resnet import ResNet as FlaxResNet
    from tiseg_tpu.models.backbones.torch_port import load_torchvision_resnet

    tv = TVResNet(TVBottleneck, [3, 4, 6, 3])
    tv.eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) * 0.5 + 0.75)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.2)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.05)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.3 + 0.85)

    bb = FlaxResNet(depth=50)
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = load_torchvision_resnet({'backbone': v['params']}, {'backbone': v['batch_stats']},
                                  depth=50, state_dict=tv.state_dict())
    assert out is not None
    params, stats = out

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    got = bb.apply({'params': params['backbone'], 'batch_stats': stats['backbone']},
                   jnp.asarray(x), train=False)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        t = tv.maxpool(tv.relu(tv.bn1(tv.conv1(t))))
        feats = []
        for layer in (tv.layer1, tv.layer2, tv.layer3, tv.layer4):
            t = layer(t)
            feats.append(t.numpy().transpose(0, 2, 3, 1))
    for i, (gg, ww) in enumerate(zip(got, feats)):
        err = float(np.abs(np.asarray(gg) - ww).max())
        assert err < 2e-4 * max(float(np.abs(ww).max()), 1.0), f'layer{i + 1}: {err}'


def _randomize_bn(tv, seed=0):
    """Non-trivial BN affine/running stats (the default init's mean=0/var=1
    would make a stats-mapping bug invisible)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) * 0.5 + 0.75)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.2)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.05)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.3 + 0.85)


def test_pretrained_dir_discovery_end_to_end(tmp_path, monkeypatch):
    """The FULL pretrained chain on a seeded synthetic torchvision
    checkpoint (VERDICT r4 item 5): a vgg16_bn*.pth placed in
    $TISEG_PRETRAINED_DIR must be discovered, torch.load'ed and imported by
    maybe_load_pretrained, and the resulting Flax backbone must reproduce
    every torch pyramid level — leaving the real checkpoint's BYTES as the
    only untested artifact (this environment cannot download them)."""
    import jax.numpy as jnp
    from reference_compat import _vgg16_bn
    from tiseg_tpu.models.backbones.torch_port import maybe_load_pretrained

    tv = _vgg16_bn()
    tv.eval()
    _randomize_bn(tv)
    torch.save(tv.state_dict(), tmp_path / 'vgg16_bn-local.pth')
    monkeypatch.setenv('TISEG_PRETRAINED_DIR', str(tmp_path))

    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict()))
    v = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    new = maybe_load_pretrained(seg, v)
    want = tv.state_dict()['features.0.weight'].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(
        np.asarray(new['params']['backbone']['stage0_conv0']['Conv_0']['kernel']), want)

    # per-stage feature parity through the imported tree
    from tiseg_tpu.models.backbones.vgg import VGG16BN
    bb = VGG16BN()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    got = bb.apply({'params': new['params']['backbone'],
                    'batch_stats': new['batch_stats']['backbone']}, jnp.asarray(x), train=False)
    taps = (5, 12, 22, 32, 42, 43)
    feats, t = [], torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for i, mod in enumerate(tv.features):
            t = mod(t)
            if i in taps:
                feats.append(t.numpy().transpose(0, 2, 3, 1))
    for i, (gg, ww) in enumerate(zip(got, feats)):
        err = float(np.abs(np.asarray(gg) - ww).max())
        assert err < 2e-4 * max(float(np.abs(ww).max()), 1.0), f'stage {i}: {err}'


def test_real_imagenet_weights_if_cached():
    """Activates the moment real torchvision ImageNet weights exist in the
    documented locations (skip-if-absent: this environment has no
    network egress to download them)."""
    from tiseg_tpu.models.backbones.torch_port import _find_cached_state_dict
    sd = _find_cached_state_dict('vgg16_bn')
    if sd is None:
        pytest.skip('no cached vgg16_bn weights (TISEG_PRETRAINED_DIR / torch hub)')
    import jax.numpy as jnp
    from reference_compat import _vgg16_bn
    from tiseg_tpu.models.backbones.vgg import VGG16BN

    tv = _vgg16_bn()
    tv.load_state_dict(sd)
    tv.eval()
    bb = VGG16BN()
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = load_torchvision_vgg({'backbone': v['params']}, {'backbone': v['batch_stats']}, state_dict=sd)
    assert out is not None
    params, stats = out
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    got = bb.apply({'params': params['backbone'], 'batch_stats': stats['backbone']},
                   jnp.asarray(x), train=False)
    taps = (5, 12, 22, 32, 42, 43)
    feats, t = [], torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for i, mod in enumerate(tv.features):
            t = mod(t)
            if i in taps:
                feats.append(t.numpy().transpose(0, 2, 3, 1))
    for i, (gg, ww) in enumerate(zip(got, feats)):
        err = float(np.abs(np.asarray(gg) - ww).max())
        assert err < 2e-4 * max(float(np.abs(ww).max()), 1.0), f'stage {i}: {err}'
