"""torchvision weight import: layout mapping onto the Flax VGG tree."""
import jax
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from tiseg_tpu.models import build_segmentor
from tiseg_tpu.models.backbones.torch_port import load_torchvision_vgg

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
