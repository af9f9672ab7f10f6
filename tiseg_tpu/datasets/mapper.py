"""DatasetMapper: file reading + pipeline driving (reference:
tiseg/datasets/dataset_mapper.py:11-58)."""
from __future__ import annotations

import copy
import os.path as osp

import cv2
import numpy as np
from PIL import Image

from .ops import class_dict


def read_image(path: str) -> np.ndarray:
    """tif via cv2 (BGR->RGB), npy via numpy, everything else via PIL."""
    suffix = osp.splitext(osp.basename(path))[1]
    if suffix == '.tif':
        img = cv2.imread(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    elif suffix == '.npy':
        img = np.load(path)
    else:
        img = np.array(Image.open(path))
    return img


class DatasetMapper:
    """Seed the pipeline dict from one data_info and run the processes
    list (names resolved via :data:`tiseg_tpu.datasets.ops.class_dict`)."""

    def __init__(self, test_mode: bool, *, processes):
        self.test_mode = test_mode
        self.processes = []
        for process in processes:
            process = dict(process)
            cls_name = process.pop('type')
            self.processes.append(class_dict[cls_name](**process))

    def __call__(self, data_info):
        data_info = copy.deepcopy(dict(data_info))
        img = read_image(data_info['file_name'])
        sem_gt = read_image(data_info['sem_file_name'])
        inst_gt = read_image(data_info['inst_file_name'])
        data_info['ori_hw'] = img.shape[:2]
        assert img.shape[:2] == sem_gt.shape[:2]
        data = {
            'img': img,
            'sem_gt': sem_gt,
            'inst_gt': inst_gt,
            'seg_fields': ['sem_gt', 'inst_gt'],
            'data_info': data_info,
        }
        for process in self.processes:
            data = process(data)
        return data
