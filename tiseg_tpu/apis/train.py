"""train_segmentor: config -> dataloaders -> mesh -> state -> runner.

Rebuild of tiseg/apis/train.py:15-149 on the TPU stack: the (MM)DDP wrap +
NCCL init becomes a 1-axis device mesh with the batch sharded over it; seed
handling is explicit PRNG keys (no cross-rank broadcast needed — every
process derives the same keys from the config seed).
"""
from __future__ import annotations

import os.path as osp
from typing import Optional

import jax
import numpy as np

from ..datasets import build_dataloader, build_dataset
from ..engine.optim import build_lr_schedule, build_optimizer
from ..engine.runner import EpochBasedRunner, IterBasedRunner
from ..engine.train_state import TrainState
from ..parallel.mesh import create_mesh
from ..utils import get_logger, set_random_seed


def init_random_seed(seed: Optional[int] = None) -> int:
    """Pick a seed; deterministic across processes because every process
    computes from the same config (reference apis/train.py:15-42 used an
    NCCL broadcast for this)."""
    if seed is not None:
        return seed
    return int(np.random.SeedSequence().generate_state(1)[0] % (2**31))


def train_segmentor(segmentor, datasets, cfg, distributed: bool = False, validate: bool = True,
                    work_dir: Optional[str] = None, seed: int = 0):
    logger = get_logger()
    work_dir = work_dir or cfg.get('work_dir', './work_dirs/tmp')
    set_random_seed(seed)

    if not isinstance(datasets, (list, tuple)):
        datasets = [datasets]
    train_dataset = datasets[0]

    mesh = create_mesh(('data',))
    world_size = jax.process_count()
    rank = jax.process_index()

    # samples_per_gpu is per-chip (mmcv semantics); the loader produces this
    # process's share of the global batch = samples_per_gpu * device_count
    local_batch = cfg.data['samples_per_gpu'] * jax.local_device_count()
    loader = build_dataloader(train_dataset,
                              samples_per_gpu=local_batch,
                              workers_per_gpu=cfg.data.get('workers_per_gpu', 4),
                              dist=world_size > 1, shuffle=True, seed=seed,
                              world_size=world_size, rank=rank, drop_last=True)

    if len(loader) == 0:
        raise ValueError(
            f'empty train loader: dataset has {len(train_dataset)} items but the '
            f'global batch is {local_batch * world_size} with drop_last — an '
            f'EpochBased/IterBased runner would spin forever on zero batches')
    iters_per_epoch = max(len(loader), 1)
    runner_cfg = dict(cfg.get('runner', {'type': 'EpochBasedRunner', 'max_epochs': 1}))
    if runner_cfg.get('type', 'EpochBasedRunner') == 'EpochBasedRunner':
        total_iters = iters_per_epoch * runner_cfg.get('max_epochs', 1)
    else:
        total_iters = runner_cfg.get('max_iters', 1)

    lr_schedule = build_lr_schedule(cfg.get('lr_config', {}), cfg.optimizer['lr'], iters_per_epoch, total_iters)
    grad_clip = (cfg.get('optimizer_config', {}) or {}).get('grad_clip', None)
    if isinstance(grad_clip, dict):
        grad_clip = grad_clip.get('max_norm')
    tx = build_optimizer(cfg.optimizer, lr_schedule, grad_clip=grad_clip)

    # init params at the training crop size
    sample = train_dataset[0]
    hw = sample['data']['img'].shape[:2]
    variables = segmentor.init_variables(jax.random.PRNGKey(seed), hw=hw)
    # ImageNet init when torchvision weights are cached locally (reference
    # backbones are always pretrained, torch_vgg.py:40)
    from ..models.backbones.torch_port import maybe_load_pretrained
    new_vars = maybe_load_pretrained(segmentor, variables)
    if new_vars is not variables:
        logger.info('initialized VGG backbone from cached torchvision weights')
        variables = new_vars
    state = TrainState.create(variables['params'], variables.get('batch_stats', {}), tx)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    logger.info(f'model params: {n_params / 1e6:.2f}M, train iters/epoch: {iters_per_epoch}')

    val_dataset = None
    if validate and 'val' in cfg.data:
        val_dataset = build_dataset(cfg.data['val'], default_args=dict(test_mode=True))

    runner_cls = EpochBasedRunner if runner_cfg.get('type', 'EpochBasedRunner') == 'EpochBasedRunner' else IterBasedRunner
    runner = runner_cls(segmentor, state, loader, cfg, work_dir, mesh=mesh, val_dataset=val_dataset,
                        lr_schedule=lr_schedule)
    if cfg.get('resume_from') == 'auto' or cfg.get('auto_resume', False):
        runner.resume()
    return runner.run()
