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


def calibrate_int8_from_dataset(segmentor, variables, dataset, n: int, hw: int = 256):
    """Post-training-quantize the eval forward: abs-max calibrate on ``n``
    center crops from the test dataset, then flip ``test_cfg['int8_eval']``
    so every subsequent jitted eval program routes through the int8
    executor (heads/quant_decode.py — UNet family; quant_cdnet.py /
    quant_hovernet.py for CDNet / HoverNet). Same scheme the TPU bench
    gates on held-out instance accuracy. Converged-model deltas
    (tools/int8_gate_study.py, docs/ROUND4.md): UNet 0.0 Aji pts, CDNet
    +0.3; HoverNet −1.8 (the int8 trunk perturbs the hv regression
    branch) — HoverNet int8 is opt-in with that documented cost."""
    import jax.numpy as jnp
    import numpy as np
    if not hasattr(segmentor, 'calibrate_int8'):
        raise SystemExit(f'{type(segmentor).__name__} has no int8 eval path '
                         '(supported: UNet/CUNet, CDNet, HoverNet)')
    if type(segmentor).__name__ == 'HoverNet':
        print('WARNING: HoverNet int8 costs ~1.8 Aji pts at converged weights '
              '(hv regression branch is int8-trunk-sensitive; '
              'tools/int8_gate_study.py) for only ~4% speed — prefer bf16 '
              'unless throughput-critical.', file=sys.stderr, flush=True)
    imgs = [np.asarray(dataset[i]['data']['img'], np.float32)
            for i in range(min(n, len(dataset)))]
    # one common /4-divisible crop size so the batch stacks (the int8
    # executors accept any /4-divisible plane)
    s = min([hw] + [min(im.shape[:2]) for im in imgs]) // 4 * 4
    crops = []
    for img in imgs:
        y0, x0 = (img.shape[0] - s) // 2, (img.shape[1] - s) // 2
        crops.append(img[y0:y0 + s, x0:x0 + s])
    segmentor.calibrate_int8(variables, jnp.asarray(np.stack(crops)))
    segmentor.test_cfg['int8_eval'] = True


def main():
    p = argparse.ArgumentParser(description='Evaluate a segmentor checkpoint')
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--show', action='store_true')
    p.add_argument('--show-folder', default=None)
    p.add_argument('--int8-calib', type=int, default=0, metavar='N',
                   help='post-training-quantize the eval forward: calibrate on N '
                        'test-set center crops, then run inference through the '
                        'int8 executor (UNet/CUNet, CDNet, HoverNet)')
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
    calibrated = False
    for tc in test_cfgs:
        dataset = build_dataset(tc, default_args=dict(test_mode=True))
        if args.int8_calib and not calibrated:
            calibrate_int8_from_dataset(segmentor, variables, dataset, args.int8_calib)
            logger.info(f'int8 eval: calibrated on {args.int8_calib} test crops')
            calibrated = True
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
