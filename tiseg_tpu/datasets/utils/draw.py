"""Visualization helpers (reference: tiseg/datasets/utils/draw.py:8-220)."""
from __future__ import annotations

import os.path as osp

import numpy as np


def colorize_seg_map(seg_map: np.ndarray, palette=None) -> np.ndarray:
    """Random-palette colorization of a label map (id 0 stays black)."""
    seg_map = np.asarray(seg_map)
    ids = np.unique(seg_map)
    n = int(seg_map.max()) + 1
    if palette is None:
        rng = np.random.default_rng(123)
        palette = rng.integers(0, 255, (max(n, 2), 3), dtype=np.int64)
    palette = np.asarray(palette)
    if len(palette) < n:
        reps = int(np.ceil(n / len(palette)))
        palette = np.tile(palette, (reps, 1))
    canvas = palette[np.clip(seg_map, 0, len(palette) - 1)].astype(np.uint8)
    canvas[seg_map == 0] = 0
    return canvas


def draw_all(save_folder, img_name, img_file_name, sem_pred, sem_gt, inst_pred, inst_gt, tc_sem_pred=None,
             tc_sem_gt=None):
    """Dump a semantic/instance comparison panel + FN/FP/TP error map."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from ..mapper import read_image

    img = read_image(img_file_name)
    fig, axes = plt.subplots(2, 3, figsize=(15, 10))
    axes[0][0].imshow(img)
    axes[0][0].set_title('image')
    axes[0][1].imshow(colorize_seg_map(sem_pred))
    axes[0][1].set_title('sem pred')
    axes[0][2].imshow(colorize_seg_map(sem_gt))
    axes[0][2].set_title('sem gt')
    axes[1][1].imshow(colorize_seg_map(inst_pred))
    axes[1][1].set_title('inst pred')
    axes[1][2].imshow(colorize_seg_map(inst_gt))
    axes[1][2].set_title('inst gt')

    # FN/FP/TP error map: red=FN, yellow=FP, green=TP
    err = np.zeros((*np.asarray(sem_pred).shape, 3), dtype=np.uint8)
    p = np.asarray(sem_pred) > 0
    g = np.asarray(sem_gt) > 0
    err[g & ~p] = (255, 0, 0)
    err[p & ~g] = (255, 255, 0)
    err[p & g] = (0, 255, 0)
    axes[1][0].imshow(err)
    axes[1][0].set_title('errors (R=FN Y=FP G=TP)')
    for ax_row in axes:
        for ax in ax_row:
            ax.axis('off')
    fig.tight_layout()
    fig.savefig(osp.join(save_folder, f'{img_name}_panel.png'), dpi=100)
    plt.close(fig)


def draw_direction(save_folder, img_name, img_file_name, pred, sem_gt, inst_gt, num_angles=8):
    """Direction-model debug panel (reference Drawer.draw_direction,
    tiseg/datasets/utils/draw.py:116-220): image, FN/FP/TP error map,
    predicted vs GT direction classes, and their direction differential
    maps. GT direction/DDM are regenerated from ``inst_gt`` with the same
    DirectionLabelMake used at train time."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from ..mapper import read_image
    from ..ops.label_maps import DirectionLabelMake
    from .direction import generate_direction_differential_map

    img = read_image(img_file_name)
    sem_pred = np.asarray(pred['sem_pred'])
    dir_pred = np.asarray(pred['dir_pred'])
    gt_data = DirectionLabelMake(num_angles=num_angles)(
        {'inst_gt': np.asarray(inst_gt), 'sem_gt': np.asarray(sem_gt), 'seg_fields': []})
    dir_gt = gt_data['dir_gt']
    ddm_pred = generate_direction_differential_map(dir_pred, num_angles + 1)[0]
    ddm_gt = generate_direction_differential_map(dir_gt, num_angles + 1)[0]

    err = np.zeros((*sem_pred.shape, 3), dtype=np.uint8)
    p = sem_pred > 0
    g = np.asarray(sem_gt) > 0
    err[g & ~p] = (255, 0, 0)
    err[p & ~g] = (255, 255, 0)
    err[p & g] = (0, 255, 0)

    panels = [
        (img, 'image', None),
        (err, 'errors (R=FN Y=FP G=TP)', None),
        (colorize_seg_map(dir_pred), 'direction pred', None),
        (colorize_seg_map(dir_gt), 'direction gt', None),
        (ddm_pred, 'DDM pred', 'gray'),
        (ddm_gt, 'DDM gt', 'gray'),
    ]
    fig, axes = plt.subplots(2, 3, figsize=(15, 10))
    for ax, (im, title, cmap) in zip(axes.ravel(), panels):
        ax.imshow(im, cmap=cmap)
        ax.set_title(title)
        ax.axis('off')
    fig.tight_layout()
    fig.savefig(osp.join(save_folder, f'{img_name}_direction.png'), dpi=100)
    plt.close(fig)
