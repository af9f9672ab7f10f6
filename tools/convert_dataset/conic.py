#!/usr/bin/env python
"""CoNIC converter (reference: tools/convert_dataset/conic.py): the CoNIC
release ships stacked arrays images.npy (N, 256, 256, 3) and labels.npy
(N, 256, 256, 2) with [..., 0]=instance ids, [..., 1]=semantic class 1-6;
emit per-image .png/_sem.png/_inst.npy triplets + stratified split txts.

Usage: python tools/convert_dataset/conic.py <root> [--val-frac 0.2] [--seed 42]
"""
import argparse
import os
import os.path as osp
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from _common import colorize_seg_map, pillow_save  # noqa: E402

CONIC_PALETTE = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [255, 0, 255],
                          [0, 255, 255]], dtype=np.uint8)


def main():
    p = argparse.ArgumentParser('Convert CoNIC dataset')
    p.add_argument('root_path', help='folder containing images.npy / labels.npy')
    p.add_argument('--val-frac', type=float, default=0.2)
    p.add_argument('--seed', type=int, default=42)
    args = p.parse_args()
    root = args.root_path

    images = np.load(osp.join(root, 'images.npy'))
    labels = np.load(osp.join(root, 'labels.npy'))
    assert images.shape[0] == labels.shape[0]

    out_dir = osp.join(root, 'imgs')
    os.makedirs(out_dir, exist_ok=True)
    names = []
    cell_counts = []
    for i in range(images.shape[0]):
        name = f'conic_{i:04d}'
        inst = labels[i, :, :, 0].astype(np.int32)
        sem = labels[i, :, :, 1].astype(np.uint8)
        Image.fromarray(images[i].astype(np.uint8)).save(osp.join(out_dir, name + '.png'))
        np.save(osp.join(out_dir, name + '_inst.npy'), inst)
        pillow_save(osp.join(out_dir, name + '_sem.png'), sem, palette=CONIC_PALETTE)
        pillow_save(osp.join(out_dir, name + '_inst_color.png'), colorize_seg_map(inst))
        names.append(name)
        cell_counts.append(len(np.unique(inst)) - 1)

    # stratified-by-cell-count split (quartile bins)
    rng = np.random.default_rng(args.seed)
    bins = np.digitize(cell_counts, np.quantile(cell_counts, [0.25, 0.5, 0.75]))
    train, val = [], []
    for b in np.unique(bins):
        idx = np.nonzero(bins == b)[0]
        rng.shuffle(idx)
        n_val = max(1, int(len(idx) * args.val_frac))
        val.extend(idx[:n_val])
        train.extend(idx[n_val:])

    with open(osp.join(root, 'train.txt'), 'w') as f:
        f.write('\n'.join(names[i] for i in sorted(train)) + '\n')
    with open(osp.join(root, 'val.txt'), 'w') as f:
        f.write('\n'.join(names[i] for i in sorted(val)) + '\n')
    print(f'converted {len(names)} images: {len(train)} train / {len(val)} val')


if __name__ == '__main__':
    main()
