"""Import PyTorch reference checkpoints into tiseg_tpu variables.

Reference users migrate by loading their trained ``epoch_*.pth`` state
dicts straight into the Flax models; the same mapping powers the
numerical parity test suite (tests/test_ref_parity.py), which copies
identical random weights into both implementations and asserts logit
closeness — retiring the silent-wrongness risks called out in SURVEY §7
(BN semantics, pad conventions, DGM wiring).

Layout conventions:
- torch Conv2d weight (O, I, kH, kW)          -> flax HWIO
- torch ConvTranspose2d weight (I, O, kH, kW) -> flax (kH, kW, I, O)
  SPATIALLY FLIPPED (flax ConvTranspose uses transpose_kernel=False;
  pinned by tests/test_torch_parity.py)
- BatchNorm weight/bias -> scale/bias (params); running_mean/var ->
  mean/var (batch_stats)

Reference module structure citations are inline per mapper.
"""
from __future__ import annotations

import copy
from typing import Dict

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, 'detach') else np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 1, 0))


def tconv_kernel(w) -> np.ndarray:
    w = np.transpose(_np(w), (2, 3, 0, 1))
    return w[::-1, ::-1].copy()


class _Mapper:
    """Collects (flax path -> array) assignments against a variables tree."""

    def __init__(self, variables, state_dict):
        self.v = copy.deepcopy({'params': variables['params'],
                                'batch_stats': variables.get('batch_stats', {})})
        self.sd = state_dict
        self.used = set()

    def _get(self, key):
        self.used.add(key)
        return self.sd[key]

    def _set(self, col, path, value):
        node = self.v[col]
        for p in path[:-1]:
            node = node[p]
        old = node[path[-1]]
        assert tuple(old.shape) == tuple(value.shape), \
            f'{col}/{"/".join(path)}: have {tuple(old.shape)}, importing {tuple(value.shape)}'
        node[path[-1]] = value.astype(np.float32)

    def conv(self, pt, fx_path, bias=False):
        self._set('params', fx_path + ('kernel',), conv_kernel(self._get(pt + '.weight')))
        if bias:
            self._set('params', fx_path + ('bias',), _np(self._get(pt + '.bias')))

    def tconv(self, pt, fx_path, bias=False):
        self._set('params', fx_path + ('kernel',), tconv_kernel(self._get(pt + '.weight')))
        if bias:
            self._set('params', fx_path + ('bias',), _np(self._get(pt + '.bias')))

    def bn(self, pt, fx_path, fold_conv_bias=None):
        """fold_conv_bias: torch conv bias of the PRECEDING conv when the
        flax conv is bias-free — BN(conv(x)+b) == BN'(conv(x)) with
        running_mean' = running_mean - b (exact)."""
        self._set('params', fx_path + ('scale',), _np(self._get(pt + '.weight')))
        self._set('params', fx_path + ('bias',), _np(self._get(pt + '.bias')))
        mean = _np(self._get(pt + '.running_mean'))
        if fold_conv_bias is not None:
            mean = mean - _np(fold_conv_bias)
        self._set('batch_stats', fx_path + ('mean',), mean)
        self._set('batch_stats', fx_path + ('var',), _np(self._get(pt + '.running_var')))

    def conv_module(self, pt, fx_path):
        """mmcv ConvModule (.conv/.bn) -> our ConvModule (Conv_0/BatchNorm_0)."""
        self.conv(pt + '.conv', fx_path + ('Conv_0',))
        self.bn(pt + '.bn', fx_path + ('BatchNorm_0',))

    def done(self):
        return self.v


# ---------------------------------------------------------------------------
# component mappers
# ---------------------------------------------------------------------------

# convs' sequential indices inside each reference backbone stage
# (torch_vgg.py:44-60 slices torchvision features: stage 0 has no pool,
# stages 1..4 start with one)
_VGG_STAGE_CONVS = {'vgg16_bn': (2, 2, 3, 3, 3), 'vgg19_bn': (2, 2, 4, 4, 4)}


def map_vgg_backbone(m: _Mapper, pt_prefix='backbone', fx_prefix='backbone',
                     model_name='vgg16_bn'):
    for s, n_convs in enumerate(_VGG_STAGE_CONVS[model_name]):
        base = 0 if s == 0 else 1  # stages >0 start with a MaxPool
        for c in range(n_convs):
            seq = base + 3 * c  # conv, bn, relu triplets
            pt = f'{pt_prefix}.stages.{s}.{seq}'
            fx = (fx_prefix, f'stage{s}_conv{c}')
            m.conv(pt, fx + ('Conv_0',))
            # torchvision VGG convs carry biases even with BN; our conv is
            # bias-free, so fold the bias into the BN running mean
            m.bn(f'{pt_prefix}.stages.{s}.{seq + 1}', fx + ('BatchNorm_0',),
                 fold_conv_bias=m.sd.get(pt + '.bias'))


def map_unet_layer(m: _Mapper, pt, fx):
    """reference UNetLayer (unet_head.py:24-49): up_conv Sequential
    (ConvTranspose2d, BN, ReLU) + convs Sequential of ConvModules."""
    m.tconv(pt + '.up_conv.0', fx + ('TransposedConvModule_0', 'ConvTranspose_0'))
    m.bn(pt + '.up_conv.1', fx + ('TransposedConvModule_0', 'BatchNorm_0'))
    m.conv_module(pt + '.convs.0', fx + ('ConvModule_0',))


def map_unet_head(m: _Mapper, pt_prefix='head', fx_prefix=('head',), num_stages=5, cls=True):
    """decode_layers[j] handles stage (num_stages-1-j) (unet_head.py:80-89
    appends bottom-first)."""
    for j in range(num_stages):
        map_unet_layer(m, f'{pt_prefix}.decode_layers.{j}', fx_prefix + (f'decode{num_stages - 1 - j}',))
    if cls:
        m.conv(f'{pt_prefix}.postprocess', fx_prefix + ('cls',), bias=True)


def map_ru(m: _Mapper, pt, fx):
    """reference RU (cd_head.py:7-38): residual_ops (ConvModule, act,
    ConvModule) + identity_ops (biased 1x1 conv)."""
    m.conv_module(pt + '.residual_ops.0', fx + ('res1',))
    m.conv_module(pt + '.residual_ops.2', fx + ('res2',))
    m.conv(pt + '.identity_ops.0.conv', fx + ('ide',), bias=True)


def map_dgm(m: _Mapper, pt, fx):
    """reference DGM (cd_head.py:62-127)."""
    for name in ('mask_feats', 'dir_feats', 'point_feats'):
        map_ru(m, f'{pt}.{name}', fx + (name,))
    m.conv(pt + '.point_to_dir_attn.conv.0', fx + ('point_to_dir_attn', 'attn'))
    m.conv(pt + '.dir_to_mask_attn.conv.0', fx + ('dir_to_mask_attn', 'attn'))
    m.conv(pt + '.point_conv', fx + ('point_conv',), bias=True)
    m.conv(pt + '.dir_conv', fx + ('dir_conv',), bias=True)
    m.conv(pt + '.mask_conv', fx + ('mask_conv',), bias=True)


_RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
_RESNET_BOTTLENECK = {50, 101}


def map_resnet(m: _Mapper, pt_prefix='backbone', fx_prefix='backbone', depth=50):
    """torchvision-style ResNet (reference torch_resnet.py / ResNetExt,
    hovernet.py:26-59; also raw torchvision ImageNet state dicts with
    pt_prefix='') -> tiseg_tpu.models.backbones.resnet naming."""
    dot = f'{pt_prefix}.' if pt_prefix else ''
    stem_bias = m.sd.get(f'{dot}conv1.bias')  # ResNetExt's replaced stem is biased
    m.conv(f'{dot}conv1', (fx_prefix, 'stem_conv'))
    m.bn(f'{dot}bn1', (fx_prefix, 'stem_bn'), fold_conv_bias=stem_bias)
    n_convs = 3 if depth in _RESNET_BOTTLENECK else 2
    for li, n_blocks in enumerate(_RESNET_LAYERS[depth], start=1):
        for b in range(n_blocks):
            pt = f'{dot}layer{li}.{b}'
            fx = (fx_prefix, f'layer{li}_block{b}')
            for c in range(1, n_convs + 1):
                m.conv(f'{pt}.conv{c}', fx + (f'conv{c}',))
                m.bn(f'{pt}.bn{c}', fx + (f'bn{c}',))
            if f'{pt}.downsample.0.weight' in m.sd:
                m.conv(f'{pt}.downsample.0', fx + ('downsample',))
                m.bn(f'{pt}.downsample.1', fx + ('bn_down',))


def map_hover_dense(m: _Mapper, pt, fx, unit_count):
    """reference DenseBlock (hovernet.py:62-122): units.{i} Sequential
    (bn, relu, conv1x1, bn, relu, convKxK grouped) + blk_bna (bn, relu)."""
    for u in range(unit_count):
        m.bn(f'{pt}.units.{u}.0', fx + (f'u{u}_bn1',))
        m.conv(f'{pt}.units.{u}.2', fx + (f'u{u}_conv1',))
        m.bn(f'{pt}.units.{u}.3', fx + (f'u{u}_bn2',))
        m.conv(f'{pt}.units.{u}.5', fx + (f'u{u}_conv2',))
    m.bn(f'{pt}.blk_bna.0', fx + ('blk_bn',))


def map_hover_branch(m: _Mapper, pt, fx):
    """reference create_decoder_branch (hovernet.py:181-211)."""
    m.conv(f'{pt}.u3.0', fx + ('u3_conva',))
    map_hover_dense(m, f'{pt}.u3.1', fx + ('u3_dense',), 8)
    m.conv(f'{pt}.u3.2', fx + ('u3_convf',))
    m.conv(f'{pt}.u2.0', fx + ('u2_conva',))
    map_hover_dense(m, f'{pt}.u2.1', fx + ('u2_dense',), 4)
    m.conv(f'{pt}.u2.2', fx + ('u2_convf',))
    m.conv(f'{pt}.u1.0', fx + ('u1_conva',))
    m.bn(f'{pt}.u0.0', fx + ('u0_bn',))
    m.conv(f'{pt}.u0.2', fx + ('u0_cls',), bias=True)


# ---------------------------------------------------------------------------
# per-segmentor importers
# ---------------------------------------------------------------------------

def import_unet(variables, state_dict) -> Dict:
    """UNet / CUNet (reference unet.py:25-32: VGG16BN + UNetHead + cls)."""
    m = _Mapper(variables, state_dict)
    map_vgg_backbone(m)
    map_unet_head(m)
    return m.done()


import_cunet = import_unet


def import_cdnet(variables, state_dict) -> Dict:
    """CDNet (reference cdnet.py:32-41: VGG16BN + CDHead = UNet decode
    stack without classifier + DGM)."""
    m = _Mapper(variables, state_dict)
    map_vgg_backbone(m)
    for j in range(5):
        map_unet_layer(m, f'head.decode_layers.{j}', ('head', 'decoder', f'decode{4 - j}'))
    map_dgm(m, 'head.postprocess', ('head', 'dgm'))
    return m.done()


def import_hovernet(variables, state_dict) -> Dict:
    """HoverNet (reference hovernet.py:157-233: ResNetExt50 stride-1 stem +
    conv_bot + tp/np/hv dense decoder branches)."""
    m = _Mapper(variables, state_dict)
    map_resnet(m, depth=50)
    m.conv('conv_bot', ('conv_bot',))
    for branch in ('tp', 'np', 'hv'):
        map_hover_branch(m, f'decoder.{branch}', (branch,))
    return m.done()


def import_dcan(variables, state_dict) -> Dict:
    """DCAN (reference dcan.py:74-122: norm-free VGG-like stages, stage6
    7x7+dropout+1x1, 1x1 cell/cont taps off stages 4/5/6)."""
    m = _Mapper(variables, state_dict)
    for k, n in ((1, 2), (2, 2), (3, 3), (4, 3), (5, 3)):
        for i in range(n):
            m.conv(f'stage{k}.{i}.conv', (f'stage{k}_conv{i}', 'Conv_0'), bias=True)
    m.conv('stage6.0.conv', ('stage6_conv0', 'Conv_0'), bias=True)
    m.conv('stage6.2.conv', ('stage6_conv1', 'Conv_0'), bias=True)
    for i, k in enumerate((4, 5, 6)):
        m.conv(f'up_conv_{k}_cell.conv', (f'cell_tap{i}',), bias=True)
        m.conv(f'up_conv_{k}_cont.conv', (f'cont_tap{i}',), bias=True)
    return m.done()


def import_dist(variables, state_dict) -> Dict:
    """DIST (reference dist.py:141-209: 5 BN-conv down stages, conv->
    bilinear-up + 2-conv up stages, sem/dist 1x1 heads)."""
    m = _Mapper(variables, state_dict)
    for s in range(1, 6):
        for i in range(2):
            m.conv_module(f'stage{s}.{i}', (f'down{s}_conv{i}',))
    for s in range(1, 5):
        m.conv_module(f'up_conv{s}.0', (f'upconv{s}',))
        for i in range(2):
            m.conv_module(f'up_stage{s}.{i}', (f'up{s}_conv{i}',))
    m.conv('sem_head', ('sem_head',), bias=True)
    m.conv('dist_head', ('dist_head',), bias=True)
    return m.done()


def _map_cbr(m: _Mapper, pt, fx, norm=True):
    """MicroNet conv helper: mmcv ConvModule -> _ConvBNRelu (Conv_0 +
    optional BatchNorm_0); norm-free reference convs carry a bias."""
    if norm:
        m.conv(pt + '.conv', fx + ('Conv_0',))
        m.bn(pt + '.bn', fx + ('BatchNorm_0',))
    else:
        m.conv(pt + '.conv', fx + ('Conv_0',), bias=True)


def import_micronet(variables, state_dict) -> Dict:
    """MicroNet / CMicroNet (reference micronet.py:27-149, cmicronet.py:
    97-127: DownBlocks w/ image branch, k5/s1 transposed-conv UpBlocks,
    three DecodeBlock aux branches + fused final conv)."""
    m = _Mapper(variables, state_dict)
    for k in range(1, 5):
        _map_cbr(m, f'db{k}.convs.0', (f'db{k}', 'conv1'))
        _map_cbr(m, f'db{k}.convs.1', (f'db{k}', 'conv2'), norm=False)
        _map_cbr(m, f'db{k}.img_convs.0', (f'db{k}', 'img_conv1'))
        _map_cbr(m, f'db{k}.img_convs.1', (f'db{k}', 'img_conv2'), norm=False)
    _map_cbr(m, 'db5.0', ('db5_conv1',), norm=False)
    _map_cbr(m, 'db5.1', ('db5_conv2',), norm=False)
    for k in range(1, 5):
        _map_cbr(m, f'ub{k}.upsample.1', (f'ub{k}', 'up_proj'), norm=False)
        _map_cbr(m, f'ub{k}.convs.0', (f'ub{k}', 'conv1'), norm=False)
        _map_cbr(m, f'ub{k}.convs.1', (f'ub{k}', 'conv2'), norm=False)
        m.tconv(f'ub{k}.in_trans_conv', (f'ub{k}', 'in_trans'), bias=True)
        m.tconv(f'ub{k}.skip_trans_conv', (f'ub{k}', 'skip_trans'), bias=True)
        _map_cbr(m, f'ub{k}.bottle_neck', (f'ub{k}', 'bottleneck'), norm=False)
    for j in (1, 2, 3):
        _map_cbr(m, f'out_branch{j}.upsample.1', (f'out{j}', 'up_proj'), norm=False)
        _map_cbr(m, f'out_branch{j}.feed_conv', (f'out{j}', 'feed'), norm=False)
        m.conv(f'out_branch{j}.sem_conv.conv', (f'out{j}', 'sem'), bias=True)
    m.conv('final_sem_conv', ('final_sem',), bias=True)
    return m.done()


def import_fullnet(variables, state_dict) -> Dict:
    """FullNet (reference fullnet.py:108-154: ConvLayer = conv->LeakyReLU
    ->BN, 7 dense blocks x 6 layers + 1x1 trans, bias-free final conv)."""
    m = _Mapper(variables, state_dict)

    def clrb(pt, fx):
        m.conv(pt + '.conv', fx + ('Conv_0',))
        m.bn(pt + '.bn', fx + ('BatchNorm_0',))

    clrb('conv1', ('conv1',))
    for bi in range(1, 8):
        for li in range(1, 7):
            clrb(f'blocks.block{bi}.denselayer{li}.conv', (f'block{bi}_layer{li}',))
        clrb(f'blocks.trans{bi}', (f'trans{bi}',))
    m.conv('conv2', ('cls',))
    return m.done()


def import_multi_task_unet(variables, state_dict) -> Dict:
    """MultiTaskUNet / MultiTaskCUNet (reference multi_task_unet.py:28-36
    + heads/multi_task_unet_head.py:43-69: shared decode stack, RU chain
    with sibling aux_mask/mask 1x1 classifiers)."""
    m = _Mapper(variables, state_dict)
    map_vgg_backbone(m)
    for j in range(5):
        map_unet_layer(m, f'head.decode_layers.{j}', ('head', 'decoder', f'decode{4 - j}'))
    br = ('head', 'branches')
    map_ru(m, 'head.postprocess.mask_feats', br + ('mask_feats',))
    map_ru(m, 'head.postprocess.aux_mask_feats', br + ('aux_mask_feats',))
    m.conv('head.postprocess.mask_conv', br + ('mask_conv',), bias=True)
    m.conv('head.postprocess.aux_mask_conv', br + ('aux_mask_conv',), bias=True)
    return m.done()


def import_multi_task_cdnet(variables, state_dict) -> Dict:
    """MultiTaskCDNet (reference multi_task_cdnet.py:118-146 + heads/
    multi_task_cd_head.py:66-160, multi_task_cd_head_twobranch.py:95-131).
    Handles serial/parallel/twobranch/noau/regression variants by key
    presence (Identity attention modules leave no state)."""
    m = _Mapper(variables, state_dict)
    map_vgg_backbone(m)
    for j in range(5):
        map_unet_layer(m, f'head.decode_layers.{j}', ('head', 'decoder', f'decode{4 - j}'))
    pt = 'head.postprocess'
    dgm = ('head', 'dgm')
    twobranch = any(k.startswith(f'{pt}.mask_all_feats.') for k in m.sd)
    names = ['tc_mask_feats', 'mask_feats', 'dir_feats', 'point_feats']
    if twobranch:
        names += ['mask_all_feats', 'dir_all_feats']
    for nm in names:
        map_ru(m, f'{pt}.{nm}', dgm + (nm,))
    attns = ['point_to_dir_attn', 'dir_to_tc_mask_attn'] + (['dir_to_mask_attn'] if twobranch else [])
    for attn in attns:
        if f'{pt}.{attn}.conv.0.weight' in m.sd:  # absent under noau
            m.conv(f'{pt}.{attn}.conv.0', dgm + (attn, 'attn'))
    for cv in ('point_conv', 'dir_conv', 'tc_mask_conv', 'mask_conv'):
        m.conv(f'{pt}.{cv}', dgm + (cv,), bias=True)
    return m.done()


IMPORTERS = {
    'UNet': import_unet,
    'CUNet': import_cunet,
    'CDNet': import_cdnet,
    'HoverNet': import_hovernet,
    'DCAN': import_dcan,
    'DIST': import_dist,
    'MicroNet': import_micronet,
    'CMicroNet': import_micronet,
    'FullNet': import_fullnet,
    'MultiTaskUNet': import_multi_task_unet,
    'MultiTaskCUNet': import_multi_task_unet,
    'MultiTaskCUNetDebug': import_multi_task_unet,
    'MultiTaskCDNet': import_multi_task_cdnet,
    'MultiTaskCDNetDebug': import_multi_task_cdnet,
}


def import_reference_checkpoint(segmentor_type: str, variables, state_dict) -> Dict:
    """Map a reference tiseg state_dict onto this framework's variables.

    ``state_dict`` may be a raw module state dict or an mmcv checkpoint
    ({'state_dict': ...}); keys may carry a 'module.' DDP prefix.
    """
    if 'state_dict' in state_dict and not hasattr(state_dict['state_dict'], 'shape'):
        state_dict = state_dict['state_dict']
    state_dict = {k[len('module.'):] if k.startswith('module.') else k: v
                  for k, v in state_dict.items()}
    if segmentor_type not in IMPORTERS:
        raise KeyError(f'no reference importer for {segmentor_type!r}; have {sorted(IMPORTERS)}')
    return IMPORTERS[segmentor_type](variables, state_dict)
