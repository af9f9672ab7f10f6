"""CLI smoke tests: tools/train.py + tools/log_analysis.py end-to-end on a
synthetic mini dataset via subprocess (2 epochs, tiny UNet input)."""
import json
import os
import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

from test_datasets import make_mini_dataset  # noqa: E402

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow

CONFIG_TPL = """
data_root = {root!r}
train_processes = [
    dict(type='Normalize'),
    dict(type='UNetLabelMake'),
    dict(type='Formatting', data_keys=['img'], label_keys=['sem_gt', 'sem_gt_inner', 'loss_weight_map']),
]
test_processes = [
    dict(type='Normalize'),
    dict(type='Formatting', data_keys=['img'], label_keys=[]),
]
data = dict(
    samples_per_gpu=1,
    workers_per_gpu=0,
    train=dict(type='MoNuSegDataset', data_root=data_root, img_dir='images', ann_dir='annotations',
               split='train.txt', processes=train_processes),
    val=dict(type='MoNuSegDataset', data_root=data_root, img_dir='images', ann_dir='annotations',
             split='train.txt', processes=test_processes),
    test=dict(type='MoNuSegDataset', data_root=data_root, img_dir='images', ann_dir='annotations',
              split='train.txt', processes=test_processes),
)
optimizer = dict(type='Adam', lr=1e-3, weight_decay=5e-4)
optimizer_config = dict()
lr_config = dict(policy='fixed', warmup=None)
runner = dict(type='EpochBasedRunner', max_epochs=2)
evaluation = dict(interval=2, save_best='Aji')
checkpoint_config = dict(interval=2, max_keep_ckpts=1)
log_config = dict(interval=1, tensorboard=False)
model = dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole', radius=1))
"""


@pytest.mark.slow
def test_train_cli(tmp_path):
    root = str(tmp_path / 'ds')
    make_mini_dataset(root, n=4, hw=64)
    cfg_path = str(tmp_path / 'cfg.py')
    with open(cfg_path, 'w') as f:
        f.write(CONFIG_TPL.format(root=root))
    work_dir = str(tmp_path / 'work')

    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8')
    r = subprocess.run([sys.executable, osp.join(REPO, 'tools', 'train.py'), cfg_path,
                        '--work-dir', work_dir, '--seed', '0'],
                       capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-4000:]
    log_path = osp.join(work_dir, 'log.jsonl')
    assert osp.exists(log_path)
    records = [json.loads(line) for line in open(log_path) if line.strip()]
    assert any(rec.get('mode') == 'val' for rec in records)

    r2 = subprocess.run([sys.executable, osp.join(REPO, 'tools', 'log_analysis.py'), log_path],
                        capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stderr
    assert 'average of last' in r2.stdout


def test_bench_train_surface():
    """BENCH_TRAIN surface: one tiny train-step chain compiles and reports
    a finite rate (CPU, 64x64, B=2)."""
    import bench
    rate = bench.bench_train('UNet', B=2, iters=1, hw=64)
    assert rate > 0


def test_bench_workload_surface():
    """The headline-bench workload pieces: the dense-nuclei generator has
    MoNuSeg-like stats, and train_briefly runs on CPU at tiny shapes."""
    import jax
    import jax.numpy as jnp
    import bench
    from tiseg_tpu.models import build_segmentor
    img, sem, inst = bench.make_bench_nuclei(0)
    assert img.shape == (256, 256, 3) and 0.12 < sem.mean() < 0.25
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', device_postprocess=True)))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    trained = bench.train_briefly(seg, variables, hw=64, steps=2, n_imgs=2)
    leaf = jax.tree_util.tree_leaves(trained['params'])[0]
    assert jnp.isfinite(leaf).all()


def test_bench_input_pipeline_cli():
    """tools/bench_input_pipeline.py runs the full train map stage for a
    family and prints an items/s/core row (tiny shapes)."""
    r = subprocess.run([sys.executable, osp.join(REPO, 'tools', 'bench_input_pipeline.py'),
                        'unet', '--items', '2', '--hw', '64'],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'items/s/core' in r.stdout

@pytest.mark.slow
def test_test_cli_int8(tmp_path):
    """tools/test.py --int8-calib N: eval CLI calibrates on test crops and
    routes inference through the int8 PTQ executor end-to-end (checkpoint
    restore -> calibrate -> eval -> metrics)."""
    root = str(tmp_path / 'ds')
    make_mini_dataset(root, n=4, hw=64)
    cfg_path = str(tmp_path / 'cfg.py')
    with open(cfg_path, 'w') as f:
        f.write(CONFIG_TPL.format(root=root))

    # save an init checkpoint in the layout tools/test.py restores
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    import orbax.checkpoint as ocp
    from tiseg_tpu.models import build_segmentor
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', radius=1)))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    ckpt = str(tmp_path / 'work' / 'ckpt')
    ocp.StandardCheckpointer().save(
        ckpt, {'params': variables['params'], 'batch_stats': variables['batch_stats']})

    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run([sys.executable, osp.join(REPO, 'tools', 'test.py'), cfg_path, ckpt,
                        '--int8-calib', '2'],
                       capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, (r.stderr[-4000:], r.stdout[-2000:])
    blob = r.stdout + r.stderr
    assert 'int8 eval: calibrated on 2 test crops' in blob
    assert 'eval results' in blob
