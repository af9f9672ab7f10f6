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
    try:
        import torch
    except ImportError:
        return None
    hub_dir = osp.expanduser('~/.cache/torch/hub/checkpoints')
    if not osp.isdir(hub_dir):
        return None
    import os
    for f in os.listdir(hub_dir):
        if f.startswith(model_name.replace('_bn', '_bn')) and f.endswith('.pth'):
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
            bb_s[name]['BatchNorm_0']['mean'] = state_dict[f'features.{bn}.running_mean'].numpy()
            bb_s[name]['BatchNorm_0']['var'] = state_dict[f'features.{bn}.running_var'].numpy()

    return params, batch_stats


def maybe_load_pretrained(segmentor, variables, model_name: str = 'vgg16_bn'):
    """Best-effort pretrained init for segmentors with a VGG 'backbone'
    submodule; returns possibly-updated variables."""
    if 'backbone' not in variables.get('params', {}):
        return variables
    out = load_torchvision_vgg(variables['params'], variables.get('batch_stats', {}), model_name)
    if out is None:
        return variables
    params, batch_stats = out
    return {'params': params, 'batch_stats': batch_stats}
