#!/usr/bin/env python
"""Single-image inference demo (reference: tools/inference.py:67-101).

Usage: python tools/inference.py <config.py> <checkpoint_dir> <image> [--out out.png]
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser('Single-image inference')
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('image')
    p.add_argument('--out', default=None)
    args = p.parse_args()

    import jax.numpy as jnp
    import jax
    from tiseg_tpu.datasets.mapper import read_image
    from tiseg_tpu.datasets.ops import Formatting, Normalize
    from tiseg_tpu.datasets.utils.draw import colorize_seg_map
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.utils import Config
    from test import load_variables

    cfg = Config.fromfile(args.config)
    seg = build_segmentor(cfg.model)
    variables = load_variables(args.checkpoint, seg)

    img = read_image(args.image)
    data = {'img': img, 'sem_gt': np.zeros(img.shape[:2], np.uint8),
            'inst_gt': np.zeros(img.shape[:2], np.int32), 'seg_fields': [], 'data_info': {}}
    data = Normalize()(data)
    data = Formatting(data_keys=['img'], label_keys=[])(data)

    fused = jax.jit(seg.inference)(variables, jnp.asarray(data['data']['img'])[None],
                                   ori_hw=img.shape[:2])
    pred = seg.postprocess({k: np.asarray(v[0]) for k, v in fused.items()})

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(img)
    axes[0].set_title('image')
    axes[1].imshow(colorize_seg_map(pred['sem_pred']))
    axes[1].set_title('semantic')
    axes[2].imshow(colorize_seg_map(pred['inst_pred']))
    axes[2].set_title('instance')
    for ax in axes:
        ax.axis('off')
    out = args.out or osp.splitext(args.image)[0] + '_pred.png'
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f'saved {out}; instances: {pred["inst_pred"].max()}')


if __name__ == '__main__':
    main()
