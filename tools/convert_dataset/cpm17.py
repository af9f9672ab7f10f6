#!/usr/bin/env python
"""CPM17 converter (reference: tools/convert_dataset_old/cpm17.py):
.mat ``inst_map`` annotations -> .png/_sem.png/_inst.npy triplets with
optional fixed-grid crops; train/test split txts from the release folders.

Usage: python tools/convert_dataset/cpm17.py <root> [-c 256]
"""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np
from scipy.io import loadmat

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from _common import colorize_seg_map, pillow_save, SEM_PALETTE  # noqa: E402


def grid_crops(image, c_size):
    H, W = image.shape[:2]
    out = []
    for i in range(0, H - c_size + 1, c_size):
        for j in range(0, W - c_size + 1, c_size):
            out.append(image[i:i + c_size, j:j + c_size])
    return out


def convert_split(raw_root, new_root, c_size=0):
    img_dir = osp.join(raw_root, 'Images')
    lbl_dir = osp.join(raw_root, 'Labels')
    os.makedirs(new_root, exist_ok=True)
    items = sorted(x[:-4] for x in os.listdir(img_dir) if x.endswith('.png'))
    names = []
    for item in items:
        image = cv2.imread(osp.join(img_dir, item + '.png'))
        inst = loadmat(osp.join(lbl_dir, item + '.mat'))['inst_map'].astype(np.int32)
        sem = (inst > 0).astype(np.uint8)
        if c_size:
            imgs, insts, sems = grid_crops(image, c_size), grid_crops(inst, c_size), grid_crops(sem, c_size)
            subs = [f'{item}_{i}' for i in range(len(imgs))]
        else:
            imgs, insts, sems, subs = [image], [inst], [sem], [item]
        for im, ins, se, name in zip(imgs, insts, sems, subs):
            cv2.imwrite(osp.join(new_root, name + '.png'), im)
            np.save(osp.join(new_root, name + '_inst.npy'), ins)
            pillow_save(osp.join(new_root, name + '_sem.png'), se, palette=SEM_PALETTE)
            pillow_save(osp.join(new_root, name + '_inst_color.png'), colorize_seg_map(ins))
            names.append(name)
    return names


def main():
    p = argparse.ArgumentParser('Convert CPM17 dataset')
    p.add_argument('root_path')
    p.add_argument('-c', '--crop-size', type=int, default=0)
    args = p.parse_args()
    root = args.root_path
    for split in ('train', 'test'):
        tag = f'c{args.crop_size}' if args.crop_size else 'c0'
        names = convert_split(osp.join(root, split), osp.join(root, split, tag), args.crop_size if split == 'train'
                              else 0)
        with open(osp.join(root, f'{split}_{tag if split == "train" else "c0"}.txt'), 'w') as f:
            f.write('\n'.join(names) + '\n')


if __name__ == '__main__':
    main()
