"""Shared helpers for dataset converters (reference: tools/convert_dataset/
monuseg.py:85-151 crop/save utilities)."""
import os
import os.path as osp
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


def colorize_seg_map(seg_map, seed=None):
    """Instance-id preview PNG: each id gets a random rainbow colour,
    background stays black (cosmetic only — nothing reads these back)."""
    rng = np.random.default_rng(seed)
    hues = rng.random(int(seg_map.max()) + 1) * 255
    out = cv2.applyColorMap(hues[seg_map].astype(np.uint8), cv2.COLORMAP_RAINBOW)
    out[seg_map == 0, :] = (0, 0, 0)
    return cv2.cvtColor(out, cv2.COLOR_BGR2RGB)


def crop_patches(image, w_size, s_size):
    """Reflect-pad by (w_size - s_size), split asymmetrically, then take
    the w_size x w_size window grid at stride s_size (row-major).

    This is the exact patch set of the reference's crop routine
    (monuseg.py:108-151, itself credited to hover_net) — dataset bit
    parity depends on it. The reference additionally carries right/bottom
    "remainder" branches guarded by ``(P - w)//s > (P - w + s)//s``; that
    inequality is unsatisfiable (``floor(x/s) + 1 == floor((x + s)/s)``),
    so the grid below is the complete behavior. Pinned bit-identical to a
    transcription of the original in tests/test_converters.py
    (test_crop_patches_matches_reference_transcription)."""
    diff = w_size - s_size
    pad = (diff // 2, diff - diff // 2)
    image = np.pad(image, (pad, pad) + ((0, 0),) * (image.ndim - 2), 'reflect')
    steps_h = (image.shape[0] - w_size) // s_size + 1
    steps_w = (image.shape[1] - w_size) // s_size + 1
    return [image[i * s_size:i * s_size + w_size, j * s_size:j * s_size + w_size]
            for i in range(max(steps_h, 0)) for j in range(max(steps_w, 0))]


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
