#!/usr/bin/env python
"""Evaluation CLI (reference: tools/test.py:33-108).

Usage: python tools/test.py <config.py> <checkpoint_dir> [--show] [--show-folder D]
``checkpoint_dir`` is an orbax checkpoint directory (e.g.
work_dirs/.../checkpoints/best or a numbered step dir).
"""
import argparse
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tiseg_tpu.apis import single_device_test
from tiseg_tpu.datasets import build_dataset
from tiseg_tpu.models import build_segmentor
from tiseg_tpu.utils import Config, get_logger, parse_option_value


def load_variables(checkpoint_dir, segmentor, hw=(256, 256)):
    import jax
    import orbax.checkpoint as ocp
    template = segmentor.init_variables(jax.random.PRNGKey(0), hw=hw)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(osp.abspath(checkpoint_dir),
                             target={'params': template['params'], 'batch_stats': template['batch_stats']})
    return restored


def main():
    p = argparse.ArgumentParser(description='Evaluate a segmentor checkpoint')
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--show', action='store_true')
    p.add_argument('--show-folder', default=None)
    p.add_argument('--options', nargs='+', default=[])
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_options({kv.split('=', 1)[0]: parse_option_value(kv.split('=', 1)[1]) for kv in args.options})

    logger = get_logger()
    segmentor = build_segmentor(cfg.model)
    variables = load_variables(args.checkpoint, segmentor)

    test_cfgs = cfg.data['test']
    if not isinstance(test_cfgs, list):
        test_cfgs = [test_cfgs]
    for tc in test_cfgs:
        dataset = build_dataset(tc, default_args=dict(test_mode=True))
        results = single_device_test(segmentor, variables, dataset, show=args.show, show_folder=args.show_folder)
        eval_results, storage = dataset.evaluate(results)
        out = osp.join(osp.dirname(osp.dirname(osp.abspath(args.checkpoint))), 'eval')
        import os
        os.makedirs(out, exist_ok=True)
        with open(osp.join(out, osp.basename(args.checkpoint) + '.p'), 'wb') as f:
            pickle.dump(storage, f)
        logger.info(f'eval results: {eval_results}')


if __name__ == '__main__':
    main()
