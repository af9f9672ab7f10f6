#!/usr/bin/env python
"""Generate the ablation / debug config grids mirroring the reference's
sweep structure (reference configs/multi_task_cdnet/**, *_debug/**).

The flag zoo itself lives in the segmentors (multi_task_cdnet.py); these
files are pure hyperparameter data. Each generated config pins the FULL
merged train_cfg of the corresponding reference sweep point (loaded
through our own _base_-resolving Config from /root/reference when
available) on top of our model/dataset bases.

Run from the repo root: python tools/gen_ablation_configs.py
Idempotent; outputs are committed, the generator is kept for provenance.
"""
import os
import os.path as osp
import re
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
REF = '/root/reference/configs'

from tiseg_tpu.utils import Config  # noqa: E402


def fmt(v, indent=8):
    if isinstance(v, dict):
        inner = ', '.join(f'{k}={fmt(x)}' for k, x in v.items())
        return f'dict({inner})'
    return repr(v)


def write(path, text):
    os.makedirs(osp.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        f.write(text)
    print('wrote', osp.relpath(path, ROOT))


# ---------------------------------------------------------------------------
# multi_task_cdnet sweep grid (conf / distance / no_distance families)
# ---------------------------------------------------------------------------

MT_CDNET_BASE = {
    'monuseg': 'multi_task_cdnet_adam-lr0.0005_bs16_256x256_300e_monuseg.py',
    'conic': 'multi_task_cdnet_adam-lr0.0005_bs16_256x256_100e_conic.py',
}


def gen_mt_cdnet():
    for ds in ('monuseg', 'conic'):
        ref_dir = osp.join(REF, 'multi_task_cdnet', ds)
        if not osp.isdir(ref_dir):
            continue
        for sub in ('', 'distance', 'no_distance'):
            d = osp.join(ref_dir, sub)
            if not osp.isdir(d):
                continue
            for fn in sorted(os.listdir(d)):
                if not fn.endswith('.py'):
                    continue
                cfg = Config.fromfile(osp.join(d, fn))
                train_cfg = dict(cfg.model.get('train_cfg', {}))
                suffix = fn.split(f'_{ds}_', 1)[1][:-3] if f'_{ds}_' in fn else 'conf'
                depth = '../..' if sub else '..'
                out = osp.join(ROOT, 'configs', 'multi_task_cdnet', ds, sub,
                               f'{suffix}.py')
                body = (
                    f"# reference sweep point: configs/multi_task_cdnet/{ds}/"
                    f"{sub + '/' if sub else ''}{fn}\n"
                    f"_base_ = ['{depth}/{MT_CDNET_BASE[ds]}']\n\n"
                    f"model = dict(train_cfg={fmt(train_cfg)})\n")
                write(out, body)


# ---------------------------------------------------------------------------
# *_debug boundary-width (d{dilation}e{erosion}) sweeps
# ---------------------------------------------------------------------------

DEBUG_TMPL = """# reference sweep point: configs/{family}/{ref_name}
# boundary ring: BoundLabelMake selem_radius={radius} (dilation/erosion sweep)
_base_ = ['../_base_/default_runtime.py']

dataset_type = 'MoNuSegDatasetDebug'
data_root = 'data/monuseg'
train_processes = [
    dict(type='Affine', scale=(0.8, 1.2), shear=5, rotate_degree=(-180, 180), translate_frac=(0, 0.01)),
    dict(type='RandomFlip', prob=0.5, direction='horizontal'),
    dict(type='RandomFlip', prob=0.5, direction='vertical'),
    dict(type='RandomCrop', crop_size=(256, 256)),
    dict(type='Pad', pad_size=(256, 256)),
    dict(type='RandomBlur'),
    dict(type='ColorJitter', hue_delta=8, saturation_range=(0.8, 1.2), brightness_delta=26,
         contrast_range=(0.75, 1.25)),
    dict(type='Normalize'),
    dict(type='BoundLabelMake', edge_id=2, selem_radius={radius}),
{extra_label_ops}    dict(type='Formatting', data_keys=['img'], label_keys={label_keys}),
]
test_processes = [
    dict(type='Normalize'),
    dict(type='Formatting', data_keys=['img'], label_keys=[]),
]

data = dict(
    samples_per_gpu=16,
    workers_per_gpu=8,
    train=dict(type=dataset_type, data_root=data_root, img_dir='imgs',
               ann_dir='imgs', split='train.txt', processes=train_processes),
    val=dict(type=dataset_type, data_root=data_root, img_dir='imgs',
             ann_dir='imgs', split='val.txt', processes=test_processes),
    test=dict(type=dataset_type, data_root=data_root, img_dir='imgs',
              ann_dir='imgs', split='val.txt', processes=test_processes),
)

model = dict(
    type='{model_type}',
    num_classes=2,
    train_cfg={train_cfg},
    test_cfg=dict(mode='split', crop_size=(256, 256), overlap_size=(40, 40),
                  rotate_degrees=[0, 90], flip_directions=['none', 'horizontal', 'vertical', 'diagonal'],
                  radius=3),
)

optimizer = dict(type='Adam', lr=0.0005, weight_decay=0.0005)
lr_config = dict(policy='step', by_epoch=True, step=[200], gamma=0.1,
                 warmup='linear', warmup_iters=100, warmup_ratio=1e-6)
runner = dict(type='EpochBasedRunner', max_epochs=300)
checkpoint_config = dict(by_epoch=True, interval=5, max_keep_ckpts=5)
evaluation = dict(interval=10, custom_intervals=[1], custom_milestones=[290],
                  save_best='mAji', rule='greater')
"""


def gen_debug(family, model_type, extra_label_ops, label_keys):
    ref_dir = osp.join(REF, family)
    for fn in sorted(os.listdir(ref_dir)):
        if not fn.endswith('.py'):
            continue
        txt = open(osp.join(ref_dir, fn)).read()
        mrad = re.search(r'selem_radius=\((\d+),\s*(\d+)\)', txt)
        radius = f'({mrad.group(1)}, {mrad.group(2)})' if mrad else '(3, 3)'
        cfg = Config.fromfile(osp.join(ref_dir, fn))
        train_cfg = dict(cfg.model.get('train_cfg', {}) or {})
        mde = re.search(r'_(d\d+e\d+)\.py$', fn)
        name = (('conf_' if '_conf_' in fn else '') + mde.group(1)) if mde else 'base'
        out = osp.join(ROOT, 'configs', family, f'{name}.py')
        write(out, DEBUG_TMPL.format(family=family, ref_name=fn, radius=radius,
                                     model_type=model_type, train_cfg=fmt(train_cfg),
                                     extra_label_ops=extra_label_ops, label_keys=label_keys))


def main():
    gen_mt_cdnet()
    gen_debug('multi_task_cunet_debug', 'MultiTaskCUNetDebug', '',
              "['sem_gt', 'sem_gt_w_bound']")
    gen_debug('multi_task_cdnet_debug', 'MultiTaskCDNetDebug',
              "    dict(type='DirectionLabelMake'),\n",
              "['sem_gt', 'sem_gt_w_bound', 'inst_gt', 'dir_gt', 'point_gt', 'loss_weight_map']")


if __name__ == '__main__':
    main()
