"""Backbone pyramid shapes (VGG + ResNet family) and the IterBasedRunner."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.models.backbones.resnet import DeeplabResNet50, ResNet, ResNetExt
from tiseg_tpu.models.backbones.vgg import VGG16BN, VGG19BN

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


def shapes(mod, hw=64):
    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)))
    outs = mod.apply(v, jnp.zeros((1, hw, hw, 3)))
    return [tuple(o.shape) for o in outs]


def test_vgg16_pyramid():
    s = shapes(VGG16BN())
    assert [x[1] for x in s] == [64, 32, 16, 8, 4, 2]
    assert [x[3] for x in s] == [64, 128, 256, 512, 512, 512]


def test_vgg19_pyramid():
    s = shapes(VGG19BN())
    assert [x[1] for x in s] == [64, 32, 16, 8, 4, 2]


@pytest.mark.parametrize('depth,last_ch', [(18, 512), (34, 512), (50, 2048)])
def test_resnet_depths(depth, last_ch):
    s = shapes(ResNet(depth=depth))
    assert [x[1] for x in s] == [16, 8, 4, 2]
    assert s[-1][3] == last_ch


def test_resnet_ext_strides():
    s = shapes(ResNetExt())
    assert [x[1] for x in s] == [64, 32, 16, 8]  # stride-1 stem, no pool


def test_deeplab_output_stride8():
    # stem/2 + pool/2, then strides (1, 2, 1, 1): output stride stays 8
    s = shapes(DeeplabResNet50())
    assert [x[1] for x in s] == [16, 8, 8, 8]


@pytest.mark.slow
def test_iter_based_runner(tmp_path):
    import sys
    import os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), 'tests'))
    from test_datasets import make_mini_dataset
    from tiseg_tpu.apis import train_segmentor
    from tiseg_tpu.datasets import build_dataset
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.utils import Config

    root = str(tmp_path / 'ds')
    make_mini_dataset(root, n=8, hw=64)
    cfg = Config.fromdict(
        dict(
            data=dict(samples_per_gpu=1, workers_per_gpu=0,
                      train=dict(type='MoNuSegDataset', data_root=root, img_dir='images', ann_dir='annotations',
                                 split='train.txt',
                                 processes=[dict(type='Normalize'), dict(type='UNetLabelMake'),
                                            dict(type='Formatting', data_keys=['img'],
                                                 label_keys=['sem_gt_inner', 'loss_weight_map'])])),
            optimizer=dict(type='Adam', lr=1e-3, weight_decay=0.0),
            optimizer_config=dict(),
            lr_config=dict(policy='poly', by_epoch=False, power=1.0, warmup=None),
            runner=dict(type='IterBasedRunner', max_iters=3),
            evaluation=dict(),
            checkpoint_config=dict(interval=0),
            log_config=dict(interval=1, tensorboard=False),
        ))
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    state = train_segmentor(seg, build_dataset(cfg.data['train']), cfg, validate=False,
                            work_dir=str(tmp_path / 'w'), seed=0)
    assert int(state.step) == 3
