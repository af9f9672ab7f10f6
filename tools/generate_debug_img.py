#!/usr/bin/env python
"""Render the runner's ``temp/*.npy`` debug dumps into comparison panels
(reference: tools/generate_debug_img.py rendering CustomRunner dumps).

Enable dumps with ``debug_dump_interval = N`` in the config; then:
Usage: python tools/generate_debug_img.py <work_dir/temp> [--out panels]
"""
import argparse
import os
import os.path as osp
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser('Render debug dumps')
    p.add_argument('temp_dir')
    p.add_argument('--out', default=None)
    args = p.parse_args()
    out_dir = args.out or osp.join(args.temp_dir, 'panels')
    os.makedirs(out_dir, exist_ok=True)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from tiseg_tpu.datasets.utils.draw import colorize_seg_map

    groups = defaultdict(dict)
    for f in sorted(os.listdir(args.temp_dir)):
        if not f.endswith('.npy'):
            continue
        stem = f[:-4]
        prefix, key = stem.split('_', 2)[0:2], stem.split('_', 2)[2]
        groups['_'.join(prefix)][key] = osp.join(args.temp_dir, f)

    for tag, items in groups.items():
        n = len(items)
        fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
        if n == 1:
            axes = [axes]
        for ax, (key, path) in zip(axes, sorted(items.items())):
            arr = np.load(path)
            if key == 'img':
                ax.imshow(np.clip(arr, 0, 1) if arr.max() <= 1.5 else arr.astype(np.uint8))
            elif arr.ndim == 2 and np.issubdtype(arr.dtype, np.integer):
                ax.imshow(colorize_seg_map(arr))
            else:
                im = arr if arr.ndim == 2 else arr[..., 0]
                ax.imshow(im, cmap='viridis')
            ax.set_title(key)
            ax.axis('off')
        fig.tight_layout()
        fig.savefig(osp.join(out_dir, f'{tag}.png'), dpi=100)
        plt.close(fig)
    print(f'rendered {len(groups)} panels to {out_dir}')


if __name__ == '__main__':
    main()
