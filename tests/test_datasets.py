import os
import os.path as osp

import cv2
import numpy as np
import pytest
from PIL import Image

from tiseg_tpu.datasets import build_dataloader, build_dataset
from tiseg_tpu.utils.morphology import label as cc_label


def make_mini_dataset(root, n=4, hw=64):
    img_dir = osp.join(root, 'images')
    ann_dir = osp.join(root, 'annotations')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    ids = []
    for i in range(n):
        inst = np.zeros((hw, hw), dtype=np.int32)
        yy, xx = np.ogrid[:hw, :hw]
        for k in range(1, 5):
            cy, cx = rng.integers(8, hw - 8, 2)
            inst[(yy - cy)**2 + (xx - cx)**2 <= 36] = k
        sem = (inst > 0).astype(np.uint8)
        img = rng.integers(0, 255, (hw, hw, 3), dtype=np.int64).astype(np.uint8)
        name = f'img_{i}'
        cv2.imwrite(osp.join(img_dir, name + '.tif'), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        Image.fromarray(sem).save(osp.join(ann_dir, name + '_sem.png'))
        np.save(osp.join(ann_dir, name + '_inst.npy'), inst)
        ids.append(name)
    with open(osp.join(root, 'train.txt'), 'w') as f:
        f.write('\n'.join(ids) + '\n')
    return img_dir, ann_dir


PROCESSES = [
    dict(type='RandomFlip', prob=0.5, direction=['horizontal', 'vertical']),
    dict(type='UNetLabelMake'),
    dict(type='Normalize'),
    dict(type='Formatting', data_keys=['img'], label_keys=['sem_gt', 'inst_gt', 'sem_gt_inner', 'loss_weight_map']),
]


@pytest.fixture(scope='module')
def mini_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('monuseg_mini'))
    make_mini_dataset(root)
    return root


def test_dataset_and_loader(mini_ds):
    cfg = dict(type='MoNuSegDataset', data_root=mini_ds, img_dir='images', ann_dir='annotations',
               split='train.txt', processes=PROCESSES)
    ds = build_dataset(cfg)
    assert len(ds) == 4
    item = ds[0]
    assert item['data']['img'].shape == (64, 64, 3)
    assert item['label']['sem_gt_inner'].dtype == np.int32

    loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b['data']['img'].shape == (2, 64, 64, 3)
    assert b['label']['loss_weight_map'].shape == (2, 64, 64)
    assert len(b['metas']) == 2


def test_sharded_sampler(mini_ds):
    cfg = dict(type='MoNuSegDataset', data_root=mini_ds, img_dir='images', ann_dir='annotations',
               split='train.txt', processes=PROCESSES)
    ds = build_dataset(cfg)
    l0 = build_dataloader(ds, 1, 0, dist=True, shuffle=False, world_size=2, rank=0)
    l1 = build_dataloader(ds, 1, 0, dist=True, shuffle=False, world_size=2, rank=1)
    i0 = l0.sampler.indices(0)
    i1 = l1.sampler.indices(0)
    assert set(i0).isdisjoint(set(i1))
    assert len(i0) + len(i1) == 4


def test_pre_eval_and_evaluate_perfect(mini_ds):
    cfg = dict(type='MoNuSegDataset', data_root=mini_ds, img_dir='images', ann_dir='annotations',
               split='train.txt', processes=PROCESSES, test_mode=True)
    ds = build_dataset(cfg)
    results = []
    for i in range(len(ds)):
        inst_gt = np.load(ds.data_infos[i]['inst_file_name'])
        sem_gt = np.array(Image.open(ds.data_infos[i]['sem_file_name']))
        results.extend(ds.pre_eval({'sem_pred': sem_gt, 'inst_pred': cc_label(inst_gt)}, i))
    eval_results, storage = ds.evaluate(results)
    assert eval_results['mAji'] == pytest.approx(100.0)
    assert eval_results['mDice'] == pytest.approx(100.0)
    assert eval_results['mPQ'] == pytest.approx(100.0, abs=0.1)
    assert 'imwAji' in eval_results and 'bAji' in eval_results


def test_conic_classwise(mini_ds, tmp_path):
    # reuse mini dataset files but through the CoNIC class-wise path with
    # sem classes in {0,1} of 7
    import shutil
    root = str(tmp_path / 'conic')
    shutil.copytree(mini_ds, root)
    # CoNIC uses .png image suffix; convert
    for f in os.listdir(osp.join(root, 'images')):
        if f.endswith('.tif'):
            img = cv2.imread(osp.join(root, 'images', f))
            cv2.imwrite(osp.join(root, 'images', f.replace('.tif', '.png')), img)
    cfg = dict(type='CoNICDataset', data_root=root, img_dir='images', ann_dir='annotations',
               split='train.txt', processes=PROCESSES, test_mode=True)
    ds = build_dataset(cfg)
    results = []
    for i in range(len(ds)):
        inst_gt = np.load(ds.data_infos[i]['inst_file_name'])
        sem_gt = np.array(Image.open(ds.data_infos[i]['sem_file_name']))
        results.extend(ds.pre_eval({'sem_pred': sem_gt, 'inst_pred': cc_label(inst_gt)}, i))
    eval_results, _ = ds.evaluate(results)
    assert eval_results['mAji'] == pytest.approx(100.0)


def test_pre_eval_device_matches_host_tables(mini_ds):
    """dataset.pre_eval_device must reduce (via evaluate) to the same
    tables as the host numpy pre_eval for imperfect predictions."""
    cfg = dict(type='MoNuSegDataset', data_root=mini_ds, img_dir='images', ann_dir='annotations',
               split='train.txt', processes=PROCESSES, test_mode=True)
    ds = build_dataset(cfg)
    host, dev = [], []
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        inst_gt = np.load(ds.data_infos[i]['inst_file_name'])
        sem_gt = np.array(Image.open(ds.data_infos[i]['sem_file_name']))
        # imperfect pred: shift GT by a pixel + drop one instance
        inst_pred = np.roll(cc_label(inst_gt), 1, axis=0)
        if inst_pred.max() > 1:
            inst_pred[inst_pred == 1] = 0
        pred = {'sem_pred': (inst_pred > 0).astype(np.uint8), 'inst_pred': inst_pred}
        host.extend(ds.pre_eval(dict(pred), i))
        dev.extend(ds.pre_eval_device(dict(pred), i))
    eh, _ = ds.evaluate(host)
    ed, _ = ds.evaluate(dev)
    for k in eh:
        assert eh[k] == pytest.approx(ed[k], abs=0.02), (k, eh[k], ed[k])


def test_pre_eval_device_cap_falls_back_to_host(mini_ds):
    """Images with more instances than the device contingency cap must
    take the (exact) host path instead of silently clipping label ids."""
    cfg = dict(type='MoNuSegDataset', data_root=mini_ds, img_dir='images', ann_dir='annotations',
               split='train.txt', processes=PROCESSES, test_mode=True)
    ds = build_dataset(cfg)
    inst_gt = np.load(ds.data_infos[0]['inst_file_name'])
    n_gt = len(np.unique(inst_gt)) - 1
    pred = {'sem_pred': (inst_gt > 0).astype(np.uint8), 'inst_pred': cc_label(inst_gt)}
    # cap below the instance count -> must match host exactly (fallback)
    dev = ds.pre_eval_device(dict(pred), 0, max_instances=max(n_gt - 1, 1))
    host = ds.pre_eval(dict(pred), 0)
    ed, _ = ds.evaluate(dev)
    eh, _ = ds.evaluate(host)
    for k in eh:
        assert eh[k] == pytest.approx(ed[k], abs=1e-9), (k, eh[k], ed[k])
    # at the boundary (cap == count) the device path is used and agrees
    dev2 = ds.pre_eval_device(dict(pred), 0, max_instances=n_gt)
    ed2, _ = ds.evaluate(dev2)
    for k in eh:
        assert eh[k] == pytest.approx(ed2[k], abs=0.02), (k, eh[k], ed2[k])


def test_show_panels_written(tmp_path):
    """pre_eval(show=True) writes the comparison panel, and the direction
    debug panel when the pred carries dir_pred (reference
    Drawer.draw/draw_direction)."""
    root = str(tmp_path / 'ds')
    make_mini_dataset(root, n=1, hw=64)
    ds = build_dataset(dict(type='MoNuSegDataset', data_root=root, img_dir='images',
                            ann_dir='annotations', split='train.txt',
                            processes=[dict(type='Normalize'),
                                       dict(type='Formatting', data_keys=['img'], label_keys=[])]),
                       default_args=dict(test_mode=True))
    rng = np.random.default_rng(0)
    inst = np.zeros((64, 64), np.int32)
    inst[10:20, 10:20] = 1
    inst[30:42, 30:44] = 2
    pred = {'sem_pred': (inst > 0).astype(np.uint8), 'inst_pred': inst,
            'dir_pred': rng.integers(0, 9, (64, 64)).astype(np.int32)}
    show_dir = str(tmp_path / 'show')
    ds.pre_eval([pred], [0], show=True, show_folder=show_dir)
    import os
    files = os.listdir(show_dir)
    assert any(f.endswith('_panel.png') for f in files)
    assert any(f.endswith('_direction.png') for f in files)
