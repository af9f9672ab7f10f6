"""ResNet backbones (Flax, NHWC).

Rebuild of the reference's torchvision-sliced ResNets (tiseg/models/
backbones/torch_resnet.py:34-177) plus HoVer-Net's ``ResNetExt`` (stride-1
7x7 stem, no stem max-pool; reference hovernet.py:26-59). Returns the
4-stage feature pyramid (layer1..layer4).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES

DEPTH_PLAN = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
}
STAGE_WIDTHS = (64, 128, 256, 512)


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                axis_name=self.axis_name if train else None, name=name)

        residual = x
        pad = ((self.dilation, self.dilation),) * 2  # torch pad=dilation; 'SAME' differs at stride 2
        y = nn.Conv(self.features, (3, 3), self.strides, padding=pad, use_bias=False,
                    kernel_dilation=(self.dilation, self.dilation), dtype=self.dtype, name='conv1')(x)
        y = nn.relu(bn('bn1')(y))
        y = nn.Conv(self.features, (3, 3), padding=pad, use_bias=False,
                    kernel_dilation=(self.dilation, self.dilation), dtype=self.dtype, name='conv2')(y)
        y = bn('bn2')(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), self.strides, use_bias=False, dtype=self.dtype,
                               name='downsample')(x)
            residual = bn('bn_down')(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # output = features * 4
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                axis_name=self.axis_name if train else None, name=name)

        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name='conv1')(x)
        y = nn.relu(bn('bn1')(y))
        pad = ((self.dilation, self.dilation),) * 2  # torch pad=dilation; 'SAME' differs at stride 2
        y = nn.Conv(self.features, (3, 3), self.strides, padding=pad, use_bias=False,
                    kernel_dilation=(self.dilation, self.dilation), dtype=self.dtype, name='conv2')(y)
        y = nn.relu(bn('bn2')(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name='conv3')(y)
        y = bn('bn3')(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1), self.strides, use_bias=False, dtype=self.dtype,
                               name='downsample')(x)
            residual = bn('bn_down')(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    depth: int = 50
    in_channels: int = 3
    stem_stride: int = 2
    stem_pool: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    stage_dilations: Sequence[int] = (1, 1, 1, 1)
    stage_strides: Sequence[int] = (1, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_type, layers = DEPTH_PLAN[self.depth]
        Block = Bottleneck if block_type == 'bottleneck' else BasicBlock

        x = nn.Conv(64, (7, 7), (self.stem_stride, self.stem_stride), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='stem_conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.axis_name if train else None, name='stem_bn')(x)
        x = nn.relu(x)
        if self.stem_pool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for si in range(4):
            for bi in range(layers[si]):
                strides = (self.stage_strides[si], self.stage_strides[si]) if bi == 0 else (1, 1)
                x = Block(STAGE_WIDTHS[si], strides=strides, dilation=self.stage_dilations[si],
                          dtype=self.dtype, axis_name=self.axis_name, name=f'layer{si + 1}_block{bi}')(x, train)
            if si in self.out_indices:
                outs.append(x)
        return outs


@BACKBONES.register_module()
class TorchResNet(ResNet):
    pass


@BACKBONES.register_module()
class ResNet50(ResNet):
    depth: int = 50


@BACKBONES.register_module()
class ResNet18(ResNet):
    depth: int = 18


@BACKBONES.register_module()
class ResNet34(ResNet):
    depth: int = 34


@BACKBONES.register_module()
class ResNet101(ResNet):
    depth: int = 101


@BACKBONES.register_module()
class DeeplabResNet50(ResNet):
    """Dilated (output-stride 8) variant."""
    depth: int = 50
    stage_strides: Sequence[int] = (1, 2, 1, 1)
    stage_dilations: Sequence[int] = (1, 1, 2, 4)


@BACKBONES.register_module()
class DeeplabResNet101(ResNet):
    depth: int = 101
    stage_strides: Sequence[int] = (1, 2, 1, 1)
    stage_dilations: Sequence[int] = (1, 1, 2, 4)


class ResNetExt(ResNet):
    """HoVer-Net trunk: stride-1 stem, no stem pooling -> pyramid strides
    (1, 2, 4, 8)."""
    depth: int = 50
    stem_stride: int = 1
    stem_pool: bool = False
