#!/usr/bin/env python
"""Training CLI (reference: tools/train.py:54-151).

Usage: python tools/train.py <config.py> [--work-dir D] [--seed N]
       [--resume-from auto] [--options k=v ...]
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tiseg_tpu.apis import train_segmentor
from tiseg_tpu.datasets import build_dataset
from tiseg_tpu.models import build_segmentor
from tiseg_tpu.utils import Config, get_logger, parse_option_value


def parse_args():
    p = argparse.ArgumentParser(description='Train a segmentor')
    p.add_argument('config')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--resume-from', default=None, help="'auto' resumes from latest checkpoint")
    p.add_argument('--no-validate', action='store_true')
    p.add_argument('--options', nargs='+', default=[], help='dotted-key overrides: a.b.c=value')
    return p.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_options({kv.split('=', 1)[0]: parse_option_value(kv.split('=', 1)[1]) for kv in args.options})

    model_name = cfg.model['type'].lower()
    cfg_stem = osp.splitext(osp.basename(args.config))[0]
    work_dir = args.work_dir or osp.join('work_dirs', model_name, cfg_stem)
    os.makedirs(work_dir, exist_ok=True)
    if args.resume_from:
        cfg.resume_from = args.resume_from

    logger = get_logger(log_file=osp.join(work_dir, 'train.log'))
    logger.info(f'config: {args.config}\nwork_dir: {work_dir}')
    cfg.dump(osp.join(work_dir, 'config.py'))

    import jax
    logger.info(f'jax devices: {jax.devices()}')

    segmentor = build_segmentor(cfg.model)
    datasets = [build_dataset(cfg.data['train'])]
    train_segmentor(segmentor, datasets, cfg, validate=not args.no_validate, work_dir=work_dir, seed=args.seed)


if __name__ == '__main__':
    main()
