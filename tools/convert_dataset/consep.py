#!/usr/bin/env python
"""CoNSeP converter (reference: tools/convert_dataset_old/consep.py):
.mat annotations carry ``inst_map`` + ``type_map``; the standard protocol
merges types (3,4) -> epithelial and (5,6,7) -> spindle, giving 4 semantic
classes + background.

Usage: python tools/convert_dataset/consep.py <root>
"""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np
from scipy.io import loadmat

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from _common import colorize_seg_map, pillow_save  # noqa: E402

PALETTE = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]], dtype=np.uint8)


def merge_types(type_map):
    out = type_map.copy()
    out[(type_map == 3) | (type_map == 4)] = 3
    out[(type_map == 5) | (type_map == 6) | (type_map == 7)] = 4
    return out


def convert_split(raw_root, new_root):
    img_dir = osp.join(raw_root, 'Images')
    lbl_dir = osp.join(raw_root, 'Labels')
    os.makedirs(new_root, exist_ok=True)
    names = []
    for fname in sorted(os.listdir(img_dir)):
        if not fname.endswith('.png'):
            continue
        item = fname[:-4]
        image = cv2.imread(osp.join(img_dir, fname))
        mat = loadmat(osp.join(lbl_dir, item + '.mat'))
        inst = mat['inst_map'].astype(np.int32)
        sem = merge_types(mat['type_map'].astype(np.uint8))
        cv2.imwrite(osp.join(new_root, item + '.png'), image)
        np.save(osp.join(new_root, item + '_inst.npy'), inst)
        pillow_save(osp.join(new_root, item + '_sem.png'), sem, palette=PALETTE)
        pillow_save(osp.join(new_root, item + '_inst_color.png'), colorize_seg_map(inst))
        names.append(item)
    return names


def main():
    p = argparse.ArgumentParser('Convert CoNSeP dataset')
    p.add_argument('root_path')
    args = p.parse_args()
    for split, folder in (('train', 'Train'), ('test', 'Test')):
        names = convert_split(osp.join(args.root_path, folder), osp.join(args.root_path, split))
        with open(osp.join(args.root_path, f'{split}.txt'), 'w') as f:
            f.write('\n'.join(names) + '\n')


if __name__ == '__main__':
    main()
