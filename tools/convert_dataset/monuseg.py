#!/usr/bin/env python
"""MoNuSeg converter (reference: tools/convert_dataset/monuseg.py:14-320).

XML contour annotations -> instance/semantic masks; reflect-padded
overlapping patch crops for training (w_size/s_size); whole-image w0_s0
copies for eval; split txt emission for the official / only-train_t16 /
only-train_t12_v4 presets.

Usage: python tools/convert_dataset/monuseg.py <root> only-train_t12_v4 -w 512 -s 256
"""
import argparse
import math
import os
import os.path as osp
import sys
import xml.etree.ElementTree as ET
from functools import partial

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from _common import crop_patches, parallel_map, save_item  # noqa: E402

SPLIT_DICT = {
    'train': [
        'TCGA-A7-A13E-01Z-00-DX1', 'TCGA-A7-A13F-01Z-00-DX1', 'TCGA-AR-A1AK-01Z-00-DX1', 'TCGA-B0-5711-01Z-00-DX1',
        'TCGA-HE-7128-01Z-00-DX1', 'TCGA-HE-7129-01Z-00-DX1', 'TCGA-18-5592-01Z-00-DX1', 'TCGA-38-6178-01Z-00-DX1',
        'TCGA-49-4488-01Z-00-DX1', 'TCGA-G9-6336-01Z-00-DX1', 'TCGA-G9-6348-01Z-00-DX1', 'TCGA-G9-6356-01Z-00-DX1'
    ],
    'val': ['TCGA-AR-A1AS-01Z-00-DX1', 'TCGA-HE-7130-01Z-00-DX1', 'TCGA-50-5931-01Z-00-DX1',
            'TCGA-G9-6363-01Z-00-DX1'],
    'test1': [
        'TCGA-E2-A1B5-01Z-00-DX1', 'TCGA-E2-A14V-01Z-00-DX1', 'TCGA-B0-5710-01Z-00-DX1', 'TCGA-B0-5698-01Z-00-DX1',
        'TCGA-21-5784-01Z-00-DX1', 'TCGA-21-5786-01Z-00-DX1', 'TCGA-CH-5767-01Z-00-DX1', 'TCGA-G9-6362-01Z-00-DX1'
    ],
    'test2': [
        'TCGA-DK-A2I6-01A-01-TS1', 'TCGA-G2-A2EK-01A-02-TSB', 'TCGA-AY-A8YK-01A-01-TS1', 'TCGA-NH-A8F7-01A-01-TS1',
        'TCGA-KB-A93J-01A-01-TS1', 'TCGA-RD-A8N9-01A-01-TS1'
    ],
}


def extract_contours(path):
    """Aperio XML -> list of int32 polygon arrays."""
    root = ET.parse(path).getroot()
    contours = []
    for region in root.iter('Region'):
        points = []
        for vertex in region.iter('Vertex'):
            points.append([math.floor(float(vertex.attrib['X'])), math.floor(float(vertex.attrib['Y']))])
        if points:
            contours.append(np.array(points, dtype=np.int32))
    return contours


def contours_to_instance(contours, height, width):
    """Filled polygons, one integer id per contour (later overwrite)."""
    mask = np.zeros((height, width), dtype=np.int32)
    for idx, contour in enumerate(contours, start=1):
        cv2.drawContours(mask, [contour], 0, int(idx), thickness=cv2.FILLED)
    return mask


def parse_single_item(item, raw_image_folder, raw_label_folder, new_path, w_size, s_size):
    image = cv2.imread(osp.join(raw_image_folder, item + '.tif'))
    H, W = image.shape[:2]
    contours = extract_contours(osp.join(raw_label_folder, item + '.xml'))
    inst = contours_to_instance(contours, H, W)
    sem = (inst > 0).astype(np.uint8)

    if w_size != 0:
        img_p = crop_patches(image, w_size, s_size)
        inst_p = crop_patches(inst, w_size, s_size)
        sem_p = crop_patches(sem, w_size, s_size)
        names = [f'{item}_{i}' for i in range(len(img_p))]
    else:
        img_p, inst_p, sem_p, names = [image], [inst], [sem], [item]

    for im, ins, se, name in zip(img_p, inst_p, sem_p, names):
        save_item(new_path, name, im, ins, se)
    return {item: names}


def convert_cohort(raw_img, raw_lbl, new_path, items, w_size=0, s_size=0, nproc=4):
    os.makedirs(new_path, exist_ok=True)
    fn = partial(parse_single_item, raw_image_folder=raw_img, raw_label_folder=raw_lbl, new_path=new_path,
                 w_size=w_size, s_size=s_size)
    out = {}
    for r in parallel_map(fn, items, nproc):
        out.update(r)
    return out


def main():
    p = argparse.ArgumentParser('Convert MoNuSeg dataset')
    p.add_argument('root_path')
    p.add_argument('split', choices=['official', 'only-train_t16', 'only-train_t12_v4'])
    p.add_argument('-w', '--window-size', type=int, default=0)
    p.add_argument('-s', '--step-size', type=int, default=0)
    p.add_argument('--nproc', type=int, default=4)
    args = p.parse_args()
    root, w_size, s_size = args.root_path, args.window_size, args.step_size
    assert w_size == 0 or w_size > s_size

    for split, name in [('train', 'MoNuSeg 2018 Training Data'), ('test', 'MoNuSegTestData')]:
        raw_root = osp.join(root, 'monuseg', name)
        if split == 'train':
            raw_img = osp.join(raw_root, 'Tissue Images')
            raw_lbl = osp.join(raw_root, 'Annotations')
            items = [x[:-4] for x in os.listdir(raw_img) if x.endswith('.tif')]
            convert_cohort(raw_img, raw_lbl, osp.join(root, split, f'w{w_size}_s{s_size}'), items, w_size, s_size,
                           args.nproc)
            if w_size != 0:
                convert_cohort(raw_img, raw_lbl, osp.join(root, split, 'w0_s0'), items, 0, 0, args.nproc)
        else:
            items = [x[:-4] for x in os.listdir(raw_root) if x.endswith('.tif')]
            convert_cohort(raw_root, raw_root, osp.join(root, split, 'w0_s0'), items, 0, 0, args.nproc)

    train_folder = osp.join(root, 'train', f'w{w_size}_s{s_size}')

    def patch_names(bases):
        names = []
        files = os.listdir(train_folder)
        for base in bases:
            for f in files:
                if base in f and f.endswith('_inst.npy'):
                    names.append(f.replace('_inst.npy', ''))
        return names

    if args.split == 'official':
        train_items = sorted({f.replace('_inst.npy', '') for f in os.listdir(train_folder)
                              if f.endswith('_inst.npy')})
        val_items = None
        test_items = SPLIT_DICT['test1'] + SPLIT_DICT['test2']
    elif args.split == 'only-train_t16':
        train_items = patch_names(SPLIT_DICT['train'] + SPLIT_DICT['val'])
        val_items = None
        test_items = SPLIT_DICT['test1'] + SPLIT_DICT['test2']
    else:  # only-train_t12_v4
        train_items = patch_names(SPLIT_DICT['train'])
        val_items = SPLIT_DICT['val']
        test_items = SPLIT_DICT['test1'] + SPLIT_DICT['test2']

    with open(osp.join(root, f'{args.split}_train_w{w_size}_s{s_size}.txt'), 'w') as f:
        f.write('\n'.join(train_items) + '\n')
    with open(osp.join(root, f'{args.split}_test_w0_s0.txt'), 'w') as f:
        f.write('\n'.join(test_items) + '\n')
    if val_items is not None:
        with open(osp.join(root, f'{args.split}_val_w0_s0.txt'), 'w') as f:
            f.write('\n'.join(val_items) + '\n')


if __name__ == '__main__':
    main()
