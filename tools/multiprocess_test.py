#!/usr/bin/env python
"""Evaluate the newest N checkpoints of a work_dir (reference: tools/
multiprocess_test.py:8-60 ran one GPU per checkpoint; on a shared TPU the
sweep runs sequentially through the cached jitted inference program, which
amortizes compilation across checkpoints).

Usage: python tools/multiprocess_test.py <config.py> <work_dir> [--num 5]
"""
import argparse
import os
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tiseg_tpu.apis import single_device_test
from tiseg_tpu.datasets import build_dataset
from tiseg_tpu.models import build_segmentor
from tiseg_tpu.utils import Config, get_logger


def main():
    p = argparse.ArgumentParser('Sweep newest checkpoints')
    p.add_argument('config')
    p.add_argument('work_dir')
    p.add_argument('--num', type=int, default=5)
    args = p.parse_args()

    logger = get_logger()
    cfg = Config.fromfile(args.config)
    seg = build_segmentor(cfg.model)
    dataset = build_dataset(cfg.data['test'] if not isinstance(cfg.data['test'], list) else cfg.data['test'][0],
                            default_args=dict(test_mode=True))

    ckpt_root = osp.join(args.work_dir, 'checkpoints')
    steps = sorted((int(d) for d in os.listdir(ckpt_root) if d.isdigit()), reverse=True)[:args.num]
    from test import load_variables
    eval_dir = osp.join(args.work_dir, 'eval')
    os.makedirs(eval_dir, exist_ok=True)
    summary = {}
    for step in steps:
        path = osp.join(ckpt_root, str(step), 'state')
        variables_path = path if osp.exists(path) else osp.join(ckpt_root, str(step))
        try:
            variables = load_variables(variables_path, seg)
        except Exception as e:  # orbax layout differences between save styles
            logger.warning(f'skip step {step}: {e}')
            continue
        if isinstance(variables, dict) and 'params' not in variables:
            variables = variables.get('state', variables)
        results = single_device_test(seg, {'params': variables['params'],
                                           'batch_stats': variables['batch_stats']}, dataset, progress=False)
        eval_results, storage = dataset.evaluate(results)
        summary[step] = eval_results
        with open(osp.join(eval_dir, f'step_{step}.p'), 'wb') as f:
            pickle.dump(storage, f)
        logger.info(f'step {step}: {eval_results}')
    with open(osp.join(eval_dir, 'sweep_summary.p'), 'wb') as f:
        pickle.dump(summary, f)


if __name__ == '__main__':
    main()
