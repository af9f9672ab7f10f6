"""Import torchvision ImageNet weights into the Flax backbones.

The reference initializes every backbone from torchvision's pretrained
``vgg16_bn`` (reference torch_vgg.py:40, unet.py:25) — every headline
number depends on that init (SURVEY.md §7 risk #4). This module maps a
torchvision state_dict onto the Flax parameter tree (OIHW -> HWIO kernel
transpose, BN scale/bias/mean/var passthrough).

Zero-egress environments can't download weights; ``load_torchvision_vgg``
therefore looks only at the local torch hub cache (or an explicit path)
and returns None when unavailable, leaving He-init in place.
"""
from __future__ import annotations

import os.path as osp
from typing import Optional

import numpy as np

from .vgg import VGG_STAGE_CONVS, VGG_STAGE_CHANNELS

# torchvision vgg*_bn `features` indices of each conv layer, per stage
_VGG16_FEATURE_IDX = {
    'vgg16_bn': [[0, 3], [7, 10], [14, 17, 20], [24, 27, 30], [34, 37, 40]],
    'vgg19_bn': [[0, 3], [7, 10], [14, 17, 20, 23], [27, 30, 33, 36], [40, 43, 46, 49]],
}


def _find_cached_state_dict(model_name: str):
    """Search the documented weight locations: $TISEG_PRETRAINED_DIR (if
    set) then the torch hub cache. Files must be named
    <model_name>*.pth (torchvision download names qualify)."""
    try:
        import torch
    except ImportError:
        return None
    import os
    dirs = [d for d in (os.environ.get('TISEG_PRETRAINED_DIR'),
                        osp.expanduser('~/.cache/torch/hub/checkpoints')) if d]
    for hub_dir in dirs:
        if not osp.isdir(hub_dir):
            continue
        for f in sorted(os.listdir(hub_dir)):
            if f.startswith(model_name) and f.endswith('.pth'):
                return torch.load(osp.join(hub_dir, f), map_location='cpu')
    return None


def load_torchvision_vgg(params: dict, batch_stats: dict, model_name: str = 'vgg16_bn',
                         state_dict=None, prefix: str = 'backbone') -> Optional[tuple]:
    """Overwrite the VGG backbone subtree of (params, batch_stats) with
    torchvision weights. Returns updated (params, batch_stats) or None if
    no weights are available."""
    if state_dict is None:
        state_dict = _find_cached_state_dict(model_name)
    if state_dict is None:
        return None

    import copy
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    bb_p = params[prefix]
    bb_s = batch_stats[prefix]

    for stage_idx, conv_ids in enumerate(_VGG16_FEATURE_IDX[model_name]):
        for ci, fid in enumerate(conv_ids):
            name = f'stage{stage_idx}_conv{ci}'
            w = state_dict[f'features.{fid}.weight'].numpy()           # (O, I, kH, kW)
            bb_p[name]['Conv_0']['kernel'] = np.transpose(w, (2, 3, 1, 0))  # HWIO
            bn = fid + 1
            bb_p[name]['BatchNorm_0']['scale'] = state_dict[f'features.{bn}.weight'].numpy()
            bb_p[name]['BatchNorm_0']['bias'] = state_dict[f'features.{bn}.bias'].numpy()
            mean = state_dict[f'features.{bn}.running_mean'].numpy()
            conv_bias = state_dict.get(f'features.{fid}.bias')
            if conv_bias is not None:
                # torchvision VGG convs are biased even with BN; our conv is
                # bias-free — fold: BN(conv+b) == BN with mean' = mean - b
                mean = mean - conv_bias.numpy()
            bb_s[name]['BatchNorm_0']['mean'] = mean
            bb_s[name]['BatchNorm_0']['var'] = state_dict[f'features.{bn}.running_var'].numpy()

    return params, batch_stats


def load_torchvision_resnet(params: dict, batch_stats: dict, depth: int = 50,
                            state_dict=None, prefix: str = 'backbone') -> Optional[tuple]:
    """Overwrite a ResNet backbone subtree with torchvision ImageNet
    weights (reference analog: hovernet.py:53-59 / torch_resnet.py
    ``pretrained=True``). Returns (params, batch_stats) or None if no
    cached weights exist. Works for the stride-1 ResNetExt stem too: the
    7x7 kernel is stride-agnostic."""
    if state_dict is None:
        state_dict = _find_cached_state_dict(f'resnet{depth}')
    if state_dict is None:
        return None
    from ...utils.torch_import import _Mapper, map_resnet
    m = _Mapper({'params': params, 'batch_stats': batch_stats}, state_dict)
    map_resnet(m, pt_prefix='', fx_prefix=prefix, depth=depth)
    out = m.done()
    return out['params'], out['batch_stats']


def _infer_backbone_name(backbone_params) -> Optional[str]:
    if 'stage0_conv0' in backbone_params:
        return 'vgg19_bn' if 'stage2_conv3' in backbone_params else 'vgg16_bn'
    if 'stem_conv' in backbone_params:
        n_l3 = sum(1 for k in backbone_params if k.startswith('layer3_block'))
        depth = {2: 18, 6: 50 if 'conv3' in backbone_params['layer1_block0'] else 34, 23: 101}.get(n_l3)
        return f'resnet{depth}' if depth else None
    return None


def maybe_load_pretrained(segmentor, variables, model_name: Optional[str] = None):
    """Best-effort pretrained init for segmentors with a 'backbone'
    submodule (backbone family inferred from the param tree); returns
    possibly-updated variables. Logs loudly when no cached weights exist
    (silent He-init fallback hid failures before)."""
    if 'backbone' not in variables.get('params', {}):
        return variables
    if model_name is None:
        model_name = _infer_backbone_name(variables['params']['backbone'])
        if model_name is None:
            return variables
    if model_name.startswith('resnet'):
        out = load_torchvision_resnet(variables['params'], variables.get('batch_stats', {}),
                                      depth=int(model_name.replace('resnet', '')))
    else:
        out = load_torchvision_vgg(variables['params'], variables.get('batch_stats', {}), model_name)
    if out is None:
        import logging
        logging.getLogger('tiseg_tpu').warning(
            'no cached torchvision %s weights found (~/.cache/torch/hub/checkpoints); '
            'backbone stays He-initialized — headline accuracy depends on ImageNet init',
            model_name)
        return variables
    params, batch_stats = out
    return {'params': params, 'batch_stats': batch_stats}
