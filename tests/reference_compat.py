"""Import the PyTorch reference (/root/reference) for numerical parity tests.

The environment has torch (CPU) but not mmcv/torchvision/numba, so this
module installs minimal faithful stubs before importing `tiseg.models`:

- mmcv.cnn.ConvModule: conv -> BN -> ReLU with mmcv's defaults
  (bias='auto' => no bias when normed), the only configuration the
  reference uses (always positional (in, out, k, s, p) + norm_cfg BN +
  act_cfg ReLU, e.g. reference unet_head.py:8-12).
- torchvision.models.vgg16_bn/vgg19_bn: the standard make_layers
  Sequential (module indices must match: the reference slices features
  by name, torch_vgg.py:12-16).
- torchvision.models.resnet: standard ResNet/Bottleneck/BasicBlock
  (HoverNet subclasses them, reference hovernet.py:13-14).
- numba.jit: pass-through decorator.

Only used by tests; never ships in the package.
"""
from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn

REFERENCE_ROOT = '/root/reference'


# ---------------------------------------------------------------------------
# mmcv stub
# ---------------------------------------------------------------------------

class Registry:
    def __init__(self, name, parent=None, scope=None):
        self.name = name
        self._modules = {} if parent is None else parent._modules

    def register_module(self, name=None, force=False, module=None):
        def _register(cls):
            self._modules[name or cls.__name__] = cls
            return cls

        if module is not None:
            return _register(module)
        return _register

    def get(self, key):
        return self._modules.get(key)

    def build(self, cfg, default_args=None):
        cfg = dict(cfg)
        args = dict(default_args or {})
        args.update(cfg)
        typ = args.pop('type')
        args = {k: v for k, v in args.items() if v is not None or k not in ('train_cfg', 'test_cfg')}
        return self._modules[typ](**args)


_ACT = {'ReLU': nn.ReLU, 'Sigmoid': nn.Sigmoid, 'LeakyReLU': nn.LeakyReLU, 'GELU': nn.GELU,
        'Tanh': nn.Tanh, 'ELU': nn.ELU}


def build_activation_layer(cfg):
    cfg = dict(cfg)
    typ = cfg.pop('type')
    cls = _ACT[typ]
    if typ in ('Sigmoid', 'Tanh', 'GELU'):
        cfg.pop('inplace', None)
    return cls(**cfg)


def build_norm_layer(cfg, num_features):
    assert cfg['type'] in ('BN', 'SyncBN')
    return 'bn', nn.BatchNorm2d(num_features)


class ConvModule(nn.Module):
    """mmcv ConvModule limited to the configurations the reference uses:
    conv -> (BN) -> (act), bias auto (off when normed)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0, dilation=1,
                 groups=1, bias='auto', conv_cfg=None, norm_cfg=None, act_cfg=dict(type='ReLU'),
                 order=('conv', 'norm', 'act')):
        super().__init__()
        assert conv_cfg is None and order == ('conv', 'norm', 'act')
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == 'auto':
            bias = not self.with_norm
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size, stride=stride, padding=padding,
                              dilation=dilation, groups=groups, bias=bias)
        if self.with_norm:
            _, self.bn = build_norm_layer(norm_cfg, out_channels)
        if self.with_activation:
            cfg = dict(act_cfg)
            cfg.setdefault('inplace', True)
            self.activate = build_activation_layer(cfg)

    def forward(self, x):
        x = self.conv(x)
        if self.with_norm:
            x = self.bn(x)
        if self.with_activation:
            x = self.activate(x)
        return x


class BaseModule(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self.init_cfg = init_cfg

    def init_weights(self):
        pass


# ---------------------------------------------------------------------------
# torchvision stub (standard public architectures)
# ---------------------------------------------------------------------------

_VGG_CFGS = {
    'vgg16_bn': [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M', 512, 512, 512, 'M', 512, 512, 512, 'M'],
    'vgg19_bn': [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M', 512, 512, 512, 512, 'M',
                 512, 512, 512, 512, 'M'],
}


def _make_vgg_features(cfg):
    layers, c_in = [], 3
    for v in cfg:
        if v == 'M':
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(c_in, v, 3, padding=1), nn.BatchNorm2d(v), nn.ReLU(inplace=True)]
            c_in = v
    return nn.Sequential(*layers)


class _VGGLike(nn.Module):
    def __init__(self, cfg_name):
        super().__init__()
        self.features = _make_vgg_features(_VGG_CFGS[cfg_name])


def _vgg16_bn(pretrained=False, **kw):
    return _VGGLike('vgg16_bn')


def _vgg19_bn(pretrained=False, **kw):
    return _VGGLike('vgg19_bn')


def _conv3x3(cin, cout, stride=1, groups=1, dilation=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=dilation, groups=groups, bias=False,
                     dilation=dilation)


def _conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1, base_width=64,
                 dilation=1, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = _conv3x3(inplanes, planes, stride)
        self.bn1 = norm_layer(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = _conv3x3(planes, planes)
        self.bn2 = norm_layer(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1, base_width=64,
                 dilation=1, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = _conv1x1(inplanes, width)
        self.bn1 = norm_layer(width)
        self.conv2 = _conv3x3(width, width, stride, groups, dilation)
        self.bn2 = norm_layer(width)
        self.conv3 = _conv1x1(width, planes * self.expansion)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000, zero_init_residual=False, groups=1,
                 width_per_group=64, replace_stride_with_dilation=None, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self._norm_layer = norm_layer
        self.inplanes = 64
        self.dilation = 1
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        self.groups = groups
        self.base_width = width_per_group
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2,
                                       dilate=replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2,
                                       dilate=replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2,
                                       dilate=replace_stride_with_dilation[2])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1, dilate=False):
        norm_layer = self._norm_layer
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(_conv1x1(self.inplanes, planes * block.expansion, stride),
                                       norm_layer(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample, self.groups, self.base_width,
                        previous_dilation, norm_layer)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes, groups=self.groups,
                                base_width=self.base_width, dilation=self.dilation,
                                norm_layer=norm_layer))
        return nn.Sequential(*layers)

    def _forward_impl(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)

    def forward(self, x):
        return self._forward_impl(x)


def _resnet_factory(block, layers):
    def f(pretrained=False, **kw):
        return ResNet(block, layers, **kw)
    return f


# ---------------------------------------------------------------------------
# stub installation
# ---------------------------------------------------------------------------

class _Unavailable:
    """Callable/attribute sink for stubbed-out functionality; raises only
    when actually invoked (the parity tests exercise forwards only)."""

    def __init__(self, name):
        self._name = name

    def __call__(self, *a, **kw):
        raise NotImplementedError(f'stub: {self._name} not available in parity tests')

    def __getattr__(self, item):
        return _Unavailable(f'{self._name}.{item}')


class _StubModule(types.ModuleType):
    def __getattr__(self, item):
        if item.startswith('__'):
            raise AttributeError(item)
        return _Unavailable(f'{self.__name__}.{item}')


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_installed = False


def install_stubs():
    global _installed
    if _installed:
        return
    _installed = True

    mmcv_models = Registry('model')
    mmcv = _mod('mmcv', __version__='1.3.7')
    cnn = _mod('mmcv.cnn', ConvModule=ConvModule, build_activation_layer=build_activation_layer,
               build_norm_layer=build_norm_layer, MODELS=mmcv_models)
    class Hook:
        pass

    class _EvalHook(Hook):
        def __init__(self, *a, **kw):
            for k, v in kw.items():
                setattr(self, k, v)
            self.args = a

        def _do_evaluate(self, runner):
            raise NotImplementedError

    class EpochBasedRunner:
        def __init__(self, *a, **kw):
            pass

    def master_only(f):
        return f

    utils = _mod('mmcv.utils', Registry=Registry)
    _mod('mmcv.utils.parrots_wrapper', SyncBatchNorm=nn.SyncBatchNorm)
    runner = _mod('mmcv.runner', BaseModule=BaseModule, HOOKS=Registry('hook'), Hook=Hook,
                  EvalHook=_EvalHook, DistEvalHook=_EvalHook, EpochBasedRunner=EpochBasedRunner)
    _mod('mmcv.runner.dist_utils', master_only=master_only)
    _mod('mmcv.runner.epoch_based_runner', EpochBasedRunner=EpochBasedRunner)
    _mod('mmcv.runner.builder', RUNNERS=Registry('runner'))
    _mod('mmcv.runner.optimizer', OPTIMIZERS=Registry('optimizer'))

    def build_from_cfg(cfg, registry, default_args=None):
        return registry.build(cfg, default_args)

    def get_dist_info():
        return 0, 1

    def print_log(msg, *a, **kw):
        pass

    utils.build_from_cfg = build_from_cfg
    utils.print_log = print_log
    utils.digit_version = lambda v: [int(x) for x in v.split('.') if x.isdigit()]
    utils.get_logger = lambda *a, **kw: __import__('logging').getLogger('stub')
    runner.get_dist_info = get_dist_info
    runner.build_optimizer = lambda *a, **kw: None
    runner.build_runner = lambda *a, **kw: None

    class DataContainer:
        def __init__(self, data, **kw):
            self.data = data

    _mod('mmcv.parallel', collate=lambda *a, **kw: None, DataContainer=DataContainer,
         MMDataParallel=object, MMDistributedDataParallel=object)
    _mod('mmcv.engine', collect_results_cpu=lambda *a, **kw: None,
         collect_results_gpu=lambda *a, **kw: None)
    mmcv.imread = _Unavailable('mmcv.imread')
    mmcv.scandir = _Unavailable('mmcv.scandir')
    mmcv.cnn, mmcv.utils, mmcv.runner = cnn, utils, runner

    # albumentations / prettytable: only referenced by transform/eval code
    # never exercised in parity tests
    A = _mod('albumentations')
    A.__class__ = _StubModule
    _mod('prettytable', PrettyTable=_Unavailable('prettytable.PrettyTable'))

    resnet_mod = _mod('torchvision.models.resnet', ResNet=ResNet, Bottleneck=Bottleneck,
                      BasicBlock=BasicBlock)
    models = _mod('torchvision.models',
                  vgg16_bn=_vgg16_bn, vgg19_bn=_vgg19_bn,
                  resnet18=_resnet_factory(BasicBlock, [2, 2, 2, 2]),
                  resnet34=_resnet_factory(BasicBlock, [3, 4, 6, 3]),
                  resnet50=_resnet_factory(Bottleneck, [3, 4, 6, 3]),
                  resnet101=_resnet_factory(Bottleneck, [3, 4, 23, 3]),
                  resnet152=_resnet_factory(Bottleneck, [3, 8, 36, 3]),
                  resnet=resnet_mod)
    tv = _mod('torchvision', models=models)
    tv.models = models

    def jit(*a, **kw):
        if a and callable(a[0]):
            return a[0]
        return lambda f: f

    _mod('numba', jit=jit, njit=jit)

    # skimage: imported at module level by the reference segmentors for CPU
    # post-processing; only the forward pass is exercised in parity tests,
    # so the functions may raise if ever called.
    for name in ('skimage', 'skimage.morphology', 'skimage.measure', 'skimage.segmentation'):
        m = _StubModule(name)
        sys.modules[name] = m
    sys.modules['skimage'].morphology = sys.modules['skimage.morphology']
    sys.modules['skimage'].measure = sys.modules['skimage.measure']
    sys.modules['skimage'].segmentation = sys.modules['skimage.segmentation']


_ref_models = None


def load_reference_models():
    """Import tiseg.models from /root/reference with stubs installed."""
    global _ref_models
    if _ref_models is not None:
        return _ref_models
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import tiseg.models as ref_models  # noqa
    _ref_models = ref_models
    return ref_models
