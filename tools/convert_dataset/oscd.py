#!/usr/bin/env python
"""OSCD (carton segmentation) converter (reference: tools/
convert_dataset_old/oscd.py): COCO-style instance polygons -> per-image
_sem.png/_inst.npy triplets.

Usage: python tools/convert_dataset/oscd.py <root> <annotations.json> <img_dir> <out_dir>
"""
import argparse
import json
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from _common import colorize_seg_map, pillow_save, SEM_PALETTE  # noqa: E402


def polygons_to_instance(anns, height, width):
    inst = np.zeros((height, width), dtype=np.int32)
    for idx, ann in enumerate(anns, start=1):
        for seg in ann.get('segmentation', []):
            pts = np.asarray(seg, dtype=np.float64).reshape(-1, 2).astype(np.int32)
            cv2.fillPoly(inst, [pts], int(idx))
    return inst


def main():
    p = argparse.ArgumentParser('Convert OSCD dataset')
    p.add_argument('ann_json')
    p.add_argument('img_dir')
    p.add_argument('out_dir')
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    with open(args.ann_json) as f:
        coco = json.load(f)
    anns_by_img = {}
    for ann in coco['annotations']:
        anns_by_img.setdefault(ann['image_id'], []).append(ann)

    names = []
    for img_info in coco['images']:
        item = osp.splitext(img_info['file_name'])[0]
        src = osp.join(args.img_dir, img_info['file_name'])
        if not osp.exists(src):
            continue
        image = cv2.imread(src)
        inst = polygons_to_instance(anns_by_img.get(img_info['id'], []), img_info['height'], img_info['width'])
        sem = (inst > 0).astype(np.uint8)
        cv2.imwrite(osp.join(args.out_dir, item + '.jpg'), image)
        np.save(osp.join(args.out_dir, item + '_inst.npy'), inst)
        pillow_save(osp.join(args.out_dir, item + '_sem.png'), sem, palette=SEM_PALETTE)
        pillow_save(osp.join(args.out_dir, item + '_inst_color.png'), colorize_seg_map(inst))
        names.append(item)
    with open(osp.join(args.out_dir, 'items.txt'), 'w') as f:
        f.write('\n'.join(names) + '\n')


if __name__ == '__main__':
    main()
