#!/usr/bin/env python
"""GlaS (gland segmentation) converter (reference: tools/
convert_dataset_old/glas.py): the release ships <name>.bmp images with
<name>_anno.bmp labeled instance maps.

Usage: python tools/convert_dataset/glas.py <root>
"""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from _common import colorize_seg_map, pillow_save, SEM_PALETTE  # noqa: E402


def main():
    p = argparse.ArgumentParser('Convert GlaS dataset')
    p.add_argument('root_path')
    args = p.parse_args()
    root = args.root_path
    splits = {'train': [], 'test': []}
    out_dirs = {s: osp.join(root, s) for s in splits}
    for d in out_dirs.values():
        os.makedirs(d, exist_ok=True)
    for fname in sorted(os.listdir(root)):
        if not fname.endswith('.bmp') or '_anno' in fname:
            continue
        item = fname[:-4]
        split = 'train' if item.startswith('train') else 'test'
        image = cv2.imread(osp.join(root, fname))
        inst = cv2.imread(osp.join(root, item + '_anno.bmp'), cv2.IMREAD_UNCHANGED).astype(np.int32)
        if inst.ndim == 3:
            inst = inst[..., 0]
        sem = (inst > 0).astype(np.uint8)
        cv2.imwrite(osp.join(out_dirs[split], item + '.png'), image)
        np.save(osp.join(out_dirs[split], item + '_inst.npy'), inst)
        pillow_save(osp.join(out_dirs[split], item + '_sem.png'), sem, palette=SEM_PALETTE)
        pillow_save(osp.join(out_dirs[split], item + '_inst_color.png'), colorize_seg_map(inst))
        splits[split].append(item)
    for split, names in splits.items():
        with open(osp.join(root, f'{split}.txt'), 'w') as f:
            f.write('\n'.join(names) + '\n')


if __name__ == '__main__':
    main()
