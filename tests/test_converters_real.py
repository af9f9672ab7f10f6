"""Converter CI on COMMITTED real-format raw samples (VERDICT r4 item 9).

tests/data/converters/ holds one miniature sample per raw release format:
Aperio-style XML + .tif tiles (MoNuSeg), .mat inst_map / inst_map+type_map
(CPM17 / CoNSeP), labeled-bmp pairs (GlaS), npy stacks (CoNIC), COCO
polygon json (OSCD). Each test copies the sample to tmp, runs the actual
converter CLI as a subprocess, and checks the emitted triplet contract
(<id>.png|.tif|.jpg, <id>_sem.png, <id>_inst.npy + split txts); the MoNuSeg
sample additionally drives convert -> 5 train steps -> evaluate end-to-end.
"""
import os
import os.path as osp
import shutil
import subprocess
import sys

import numpy as np
import pytest

HERE = osp.dirname(osp.abspath(__file__))
DATA = osp.join(HERE, 'data', 'converters')
TOOLS = osp.join(osp.dirname(HERE), 'tools', 'convert_dataset')


def _run(script, *args):
    r = subprocess.run([sys.executable, osp.join(TOOLS, script), *map(str, args)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def _copy(name, tmp_path):
    dst = str(tmp_path / name)
    shutil.copytree(osp.join(DATA, name), dst)
    return dst


def _check_triplet(folder, item, img_ext='.png'):
    assert osp.exists(osp.join(folder, item + img_ext)), item + img_ext
    inst = np.load(osp.join(folder, item + '_inst.npy'))
    assert inst.ndim == 2 and inst.max() > 0
    from PIL import Image  # palette png -> class indices (cv2 would expand to BGR)
    sem = np.asarray(Image.open(osp.join(folder, item + '_sem.png')))
    np.testing.assert_array_equal(sem > 0, inst > 0)
    return inst


def test_monuseg_real_format(tmp_path):
    root = _copy('monuseg', tmp_path)
    _run('monuseg.py', root, 'official', '--nproc', 1)
    folder = osp.join(root, 'train', 'w0_s0')
    inst = _check_triplet(folder, 'TCGA-T1-A6J8-01Z-00-DX1', img_ext='.tif')
    assert inst.max() >= 4  # the XML contours became distinct instances
    assert osp.exists(osp.join(root, 'official_train_w0_s0.txt'))
    assert osp.exists(osp.join(root, 'test', 'w0_s0', 'TCGA-T2-A6J9-01Z-00-DX1_inst.npy'))


def test_cpm17_real_format(tmp_path):
    root = _copy('cpm17', tmp_path)
    _run('cpm17.py', root)
    for split in ('train', 'test'):
        folder = osp.join(root, split, 'c0')
        _check_triplet(folder, 'image_00')
    assert osp.exists(osp.join(root, 'train_c0.txt'))


def test_consep_real_format(tmp_path):
    root = _copy('consep', tmp_path)
    _run('consep.py', root)
    _check_triplet(osp.join(root, 'train'), 'train_1')
    _check_triplet(osp.join(root, 'test'), 'test_1')
    assert osp.exists(osp.join(root, 'train.txt'))


def test_glas_real_format(tmp_path):
    root = _copy('glas', tmp_path)
    _run('glas.py', root)
    _check_triplet(osp.join(root, 'train'), 'train_1')
    _check_triplet(osp.join(root, 'test'), 'testA_1')


def test_conic_real_format(tmp_path):
    root = _copy('conic', tmp_path)
    _run('conic.py', root)
    folder = osp.join(root, 'imgs')
    inst = _check_triplet(folder, 'conic_0000')
    assert inst.max() > 0
    # class-wise sem: values beyond binary are allowed (CoNIC is 7-class)
    assert osp.exists(osp.join(root, 'train.txt')) or osp.exists(osp.join(root, 'val.txt'))


def test_oscd_real_format(tmp_path):
    root = _copy('oscd', tmp_path)
    out = str(tmp_path / 'oscd_out')
    _run('oscd.py', osp.join(root, 'ann.json'), osp.join(root, 'imgs'), out)
    inst = _check_triplet(out, 'carton_0001', img_ext='.jpg')
    assert inst.max() >= 4
    assert osp.exists(osp.join(out, 'items.txt'))


@pytest.mark.slow
def test_monuseg_convert_train_eval_e2e(tmp_path):
    """Real-format XML tile -> converter (with the reference's reflect-pad
    window cropping, w32/s16 on the 96^2 tile -> 25 patches) ->
    MoNuSegDataset -> 5 train steps -> evaluate (VERDICT item 9 'Done'
    criterion)."""
    root = _copy('monuseg', tmp_path)
    _run('monuseg.py', root, 'official', '-w', 32, '-s', 16, '--nproc', 1)

    from tiseg_tpu.apis import single_device_test, train_segmentor
    from tiseg_tpu.datasets import build_dataset
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.utils import Config

    processes = [
        dict(type='Normalize'),
        dict(type='UNetLabelMake'),
        dict(type='Formatting', data_keys=['img'],
             label_keys=['sem_gt', 'sem_gt_inner', 'loss_weight_map']),
    ]
    ds_cfg = dict(type='MoNuSegDataset', data_root=root, img_dir='train/w32_s16',
                  ann_dir='train/w32_s16', split='official_train_w32_s16.txt', processes=processes)
    val_cfg = dict(ds_cfg, processes=[dict(type='Normalize'),
                                      dict(type='Formatting', data_keys=['img'], label_keys=[])])
    cfg = Config.fromdict(dict(
        data=dict(samples_per_gpu=1, workers_per_gpu=0, train=ds_cfg, val=val_cfg),
        optimizer=dict(type='Adam', lr=1e-3, weight_decay=0.0),
        optimizer_config=dict(), lr_config=dict(policy='fixed'),
        runner=dict(type='IterBasedRunner', max_iters=5),
        evaluation=dict(interval=100), checkpoint_config=dict(interval=100),
        log_config=dict(interval=1)))
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', radius=1, fast_eval=False)))
    train_ds = build_dataset(cfg.data['train'])
    state = train_segmentor(seg, train_ds, cfg, work_dir=str(tmp_path / 'work'), seed=0)
    assert int(state.step) == 5

    val_ds = build_dataset(cfg.data['val'], default_args=dict(test_mode=True))
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    results = single_device_test(seg, variables, val_ds, progress=False)
    eval_results, _ = val_ds.evaluate(results)
    assert np.isfinite(eval_results['mDice'])
