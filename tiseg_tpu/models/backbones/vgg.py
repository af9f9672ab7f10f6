"""VGG-BN multi-scale backbones (Flax, NHWC).

Rebuild of the reference's torchvision-sliced backbones (tiseg/models/
backbones/torch_vgg.py:18-88): a VGG16-BN/VGG19-BN trunk cut into 6 stages
returning the feature pyramid at strides (1, 2, 4, 8, 16, 32) with channels
(64, 128, 256, 512, 512, 512). Stage s>0 starts with a 2x2 max-pool; the
last stage is pool-only.

ImageNet initialization: if torchvision's cached ``vgg16_bn`` weights exist
on disk they can be imported with :func:`tiseg_tpu.models.backbones.
torch_port.load_torchvision_vgg`; otherwise He-init from scratch.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from ..nn import ConvModule, max_pool_2x

# convs per stage (stages 1..4 start with a pool; stage 5 is pool only)
VGG_STAGE_CONVS = {
    'vgg16_bn': (2, 2, 3, 3, 3),
    'vgg19_bn': (2, 2, 4, 4, 4),
}
VGG_STAGE_CHANNELS = (64, 128, 256, 512, 512)


class VGG(nn.Module):
    model_name: str = 'vgg16_bn'
    in_channels: int = 3
    out_indices: Sequence[int] = (0, 1, 2, 3, 4, 5)
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.in_channels != 3:
            x = ConvModule(3, (1, 1), dtype=self.dtype, axis_name=self.axis_name, name='input_stem')(x, train)

        stage_convs = VGG_STAGE_CONVS[self.model_name]
        outs = []
        for stage_idx in range(6):
            if stage_idx < 5:
                if stage_idx > 0:
                    x = max_pool_2x(x)
                for ci in range(stage_convs[stage_idx]):
                    x = ConvModule(VGG_STAGE_CHANNELS[stage_idx], (3, 3), dtype=self.dtype,
                                   axis_name=self.axis_name, name=f'stage{stage_idx}_conv{ci}')(x, train)
            else:
                x = max_pool_2x(x)
            if stage_idx in self.out_indices:
                outs.append(x)
        return outs


@BACKBONES.register_module()
class VGG16BN(VGG):
    model_name: str = 'vgg16_bn'


@BACKBONES.register_module()
class VGG19BN(VGG):
    model_name: str = 'vgg19_bn'
