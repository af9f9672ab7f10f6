"""End-to-end mini-train smoke test on the 8-virtual-device CPU mesh: the
TPU-native answer to 'distributed testing without a cluster' (SURVEY.md §4)."""
import os.path as osp

import jax
import numpy as np
import pytest

from tiseg_tpu.apis import single_device_test, train_segmentor
from tiseg_tpu.datasets import build_dataset
from tiseg_tpu.models import build_segmentor
from tiseg_tpu.utils import Config

from test_datasets import make_mini_dataset

TRAIN_PROCESSES = [
    dict(type='RandomFlip', prob=0.5, direction=['horizontal']),
    dict(type='Normalize'),
    dict(type='UNetLabelMake'),
    dict(type='Formatting', data_keys=['img'], label_keys=['sem_gt', 'sem_gt_inner', 'loss_weight_map']),
]
TEST_PROCESSES = [
    dict(type='Normalize'),
    dict(type='Formatting', data_keys=['img'], label_keys=[]),
]


# deliberately in the <5-min core tier: the one full train->checkpoint->eval
# smoke `pytest -m 'not slow'` keeps (VERDICT r3 item 8)
def test_train_eval_e2e(tmp_path):
    assert jax.device_count() == 8
    root = str(tmp_path / 'ds')
    make_mini_dataset(root, n=8, hw=64)

    cfg = Config.fromdict(
        dict(
            data=dict(
                samples_per_gpu=1,  # per-device; global batch = 8 on the 8-device mesh
                workers_per_gpu=2,
                train=dict(type='MoNuSegDataset', data_root=root, img_dir='images', ann_dir='annotations',
                           split='train.txt', processes=TRAIN_PROCESSES),
                val=dict(type='MoNuSegDataset', data_root=root, img_dir='images', ann_dir='annotations',
                         split='train.txt', processes=TEST_PROCESSES),
            ),
            optimizer=dict(type='Adam', lr=1e-3, weight_decay=5e-4),
            optimizer_config=dict(),
            lr_config=dict(policy='step', by_epoch=True, step=[100], gamma=0.1, warmup='linear', warmup_iters=2,
                           warmup_ratio=1e-2),
            runner=dict(type='EpochBasedRunner', max_epochs=2),
            evaluation=dict(interval=2, save_best='Aji', rule='greater'),
            checkpoint_config=dict(by_epoch=True, interval=2, max_keep_ckpts=2),
            log_config=dict(interval=1),
        ))

    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', radius=1)))
    train_ds = build_dataset(cfg.data['train'])
    state = train_segmentor(seg, train_ds, cfg, work_dir=str(tmp_path / 'work'), seed=0)

    assert int(state.step) == 2  # 8 imgs / bs 8 = 1 iter/epoch * 2 epochs
    # checkpoints written
    assert osp.isdir(str(tmp_path / 'work' / 'checkpoints'))

    # eval path end-to-end
    val_ds = build_dataset(cfg.data['val'], default_args=dict(test_mode=True))
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    results = single_device_test(seg, variables, val_ds, progress=False)
    eval_results, _ = val_ds.evaluate(results)
    assert np.isfinite(eval_results['mDice'])
    # log.jsonl written with train + val records
    from tiseg_tpu.utils import JsonlLogger
    records = JsonlLogger(str(tmp_path / 'work' / 'log.jsonl')).read()
    assert any(r['mode'] == 'train' for r in records)
    assert any(r['mode'] == 'val' for r in records)


@pytest.mark.slow
@pytest.mark.slow
def test_auto_resume(tmp_path):
    root = str(tmp_path / 'ds')
    make_mini_dataset(root, n=8, hw=64)
    base = dict(
        data=dict(
            samples_per_gpu=1,
            workers_per_gpu=0,
            train=dict(type='MoNuSegDataset', data_root=root, img_dir='images', ann_dir='annotations',
                       split='train.txt', processes=TRAIN_PROCESSES),
        ),
        optimizer=dict(type='Adam', lr=1e-3, weight_decay=0.0),
        optimizer_config=dict(),
        lr_config=dict(policy='fixed', warmup=None),
        evaluation=dict(),
        checkpoint_config=dict(interval=1, max_keep_ckpts=2),
        log_config=dict(interval=1, tensorboard=False),
    )
    work = str(tmp_path / 'work')

    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    cfg1 = Config.fromdict({**base, 'runner': dict(type='EpochBasedRunner', max_epochs=1)})
    state1 = train_segmentor(seg, build_dataset(cfg1.data['train']), cfg1, validate=False, work_dir=work, seed=0)
    assert int(state1.step) == 1

    cfg2 = Config.fromdict({**base, 'runner': dict(type='EpochBasedRunner', max_epochs=2), 'auto_resume': True})
    state2 = train_segmentor(seg, build_dataset(cfg2.data['train']), cfg2, validate=False, work_dir=work, seed=0)
    # resumed from epoch 1 -> ran exactly one more epoch
    assert int(state2.step) == 2
