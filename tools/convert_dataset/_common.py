"""Shared helpers for dataset converters (reference: tools/convert_dataset/
monuseg.py:85-151 crop/save utilities)."""
import math
import os
import os.path as osp
import random
from concurrent.futures import ProcessPoolExecutor

import cv2
import numpy as np
from PIL import Image

SEM_PALETTE = np.zeros((2, 3), dtype=np.uint8)
SEM_PALETTE[1] = (255, 255, 2)


def pillow_save(save_path, array, palette=None):
    image = Image.fromarray(array.astype(np.uint8))
    if palette is not None:
        image = image.convert('P')
        image.putpalette(palette)
    image.save(save_path)


def colorize_seg_map(seg_map):
    colorful = np.zeros(seg_map.shape, dtype=np.float32)
    for id_ in np.unique(seg_map):
        if id_ == 0:
            continue
        colorful[seg_map == id_] = random.random()
    out = cv2.applyColorMap((colorful * 255).astype(np.uint8), cv2.COLORMAP_RAINBOW)
    out[seg_map == 0, :] = (0, 0, 0)
    return cv2.cvtColor(out, cv2.COLOR_BGR2RGB)


def crop_patches(image, w_size, s_size):
    """Reflect-padded overlapping sliding-window crops plus right/bottom
    remainder rows (reference monuseg.py:108-151)."""
    patches = []
    diff = w_size - s_size
    pad1 = diff // 2
    pad2 = diff - pad1

    if image.ndim == 2:
        image = np.pad(image[:, :, None], ((pad1, pad2), (pad1, pad2), (0, 0)), 'reflect')[:, :, 0]
    else:
        image = np.pad(image, ((pad1, pad2), (pad1, pad2), (0, 0)), 'reflect')

    pad_h, pad_w = image.shape[:2]
    h_last_step = math.floor((pad_h - w_size) / s_size)
    h_last = (h_last_step + 1) * s_size
    w_last_step = math.floor((pad_w - w_size) / s_size)
    w_last = (w_last_step + 1) * s_size

    for i in range(0, h_last, s_size):
        for j in range(0, w_last, s_size):
            patches.append(image[i:i + w_size, j:j + w_size])
    if h_last_step > ((pad_h - w_size + s_size) // s_size):
        i = pad_h - w_size
        for j in range(0, w_last, s_size):
            patches.append(image[i:i + w_size, j:j + w_size])
    if w_last_step > ((pad_w - w_size + s_size) // s_size):
        j = pad_w - w_size
        for i in range(0, h_last, s_size):
            patches.append(image[i:i + w_size, j:j + w_size])
    if (h_last_step > ((pad_h - w_size + s_size) // s_size)
            and w_last_step > ((pad_w - w_size + s_size) // s_size)):
        patches.append(image[pad_h - w_size:pad_h, pad_w - w_size:pad_w])
    return patches


def save_item(new_path, sub_item, image_bgr, inst, sem):
    """Write the .tif/_inst.npy/_sem.png triplet (+ colorized preview)."""
    if osp.exists(osp.join(new_path, sub_item + '.tif')):
        return
    cv2.imwrite(osp.join(new_path, sub_item + '.tif'), image_bgr)
    np.save(osp.join(new_path, sub_item + '_inst.npy'), inst)
    pillow_save(osp.join(new_path, sub_item + '_inst_color.png'), colorize_seg_map(inst))
    pillow_save(osp.join(new_path, sub_item + '_sem.png'), sem, palette=SEM_PALETTE)


def parallel_map(fn, items, nproc=4):
    if nproc <= 1:
        return [fn(it) for it in items]
    with ProcessPoolExecutor(nproc) as pool:
        return list(pool.map(fn, items))
