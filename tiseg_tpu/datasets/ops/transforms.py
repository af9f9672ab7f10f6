"""Geometric & photometric augmentations (host-side numpy/cv2).

Rebuilds the reference pipeline ops (tiseg/datasets/ops/transform.py:9-561)
without mmcv/albumentations. Each op takes and returns the pipeline ``data``
dict {img, sem_gt, inst_gt, ..., seg_fields, data_info}. Images are RGB
uint8 HWC until ``Normalize``.
"""
from __future__ import annotations

import random

import cv2
import numpy as np


def _flip(arr, direction):
    if direction == 'horizontal':
        return np.ascontiguousarray(arr[:, ::-1])
    if direction == 'vertical':
        return np.ascontiguousarray(arr[::-1, :])
    if direction == 'diagonal':
        return np.ascontiguousarray(arr[::-1, ::-1])
    raise ValueError(direction)


def _rotate(arr, angle, border_value=0, center=None, interpolation=cv2.INTER_LINEAR):
    """Rotate clockwise by ``angle`` degrees around center (mmcv.imrotate
    convention)."""
    h, w = arr.shape[:2]
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    matrix = cv2.getRotationMatrix2D(center, -angle, 1.0)
    dtype = arr.dtype
    rotated = cv2.warpAffine(
        arr.astype(np.float32) if dtype not in (np.uint8, np.float32) else arr,
        matrix, (w, h), flags=interpolation, borderValue=border_value)
    return rotated.astype(dtype)


class ColorJitter:
    """Sequential photometric distortion: brightness, contrast (first or
    last), saturation, hue — each applied with probability 2/3 like the
    reference's ``random.randint(0, 2)`` gate (transform.py:9-92)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    @staticmethod
    def convert(img, alpha=1, beta=0):
        img = img.astype(np.float32) * alpha + beta
        return np.clip(img, 0, 255).astype(np.uint8)

    def brightness(self, img):
        if random.randint(0, 2):
            return self.convert(img, beta=random.uniform(-self.brightness_delta, self.brightness_delta))
        return img

    def contrast(self, img):
        if random.randint(0, 2):
            return self.convert(img, alpha=random.uniform(self.contrast_lower, self.contrast_upper))
        return img

    def saturation(self, img):
        if random.randint(0, 2):
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
            hsv[:, :, 1] = self.convert(hsv[:, :, 1], alpha=random.uniform(self.saturation_lower,
                                                                           self.saturation_upper))
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
        return img

    def hue(self, img):
        if random.randint(0, 2):
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
            hsv[:, :, 0] = (hsv[:, :, 0].astype(int) + random.randint(-self.hue_delta, self.hue_delta)) % 180
            img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        return img

    def __call__(self, data):
        img = data['img']
        img = self.brightness(img)
        mode = random.randint(0, 2)
        if mode == 1:
            img = self.contrast(img)
        img = self.saturation(img)
        img = self.hue(img)
        if mode == 0:
            img = self.contrast(img)
        data['img'] = img
        return data


class AlbuColorJitter:
    """torchvision/albumentations-style ColorJitter (uniform factors)."""

    def __init__(self, brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1, prob=0.5):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.prob = prob

    def __call__(self, data):
        if np.random.rand() >= self.prob:
            return data
        img = data['img'].astype(np.float32)
        if self.brightness:
            img = np.clip(img * random.uniform(1 - self.brightness, 1 + self.brightness), 0, 255)
        if self.contrast:
            mean = img.mean()
            img = np.clip((img - mean) * random.uniform(1 - self.contrast, 1 + self.contrast) + mean, 0, 255)
        img = img.astype(np.uint8)
        if self.saturation:
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
            hsv[:, :, 1] = np.clip(hsv[:, :, 1] * random.uniform(1 - self.saturation, 1 + self.saturation), 0, 255)
            img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        if self.hue:
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
            shift = int(random.uniform(-self.hue, self.hue) * 180)
            hsv[:, :, 0] = (hsv[:, :, 0].astype(int) + shift) % 180
            img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        data['img'] = img
        return data


class Resize:

    def __init__(self, min_size=None, max_size=None, scale_factor=None, resize_mode='fix'):
        self.min_size = min_size
        self.max_size = max_size
        self.scale_factor = scale_factor
        self.resize_mode = resize_mode

    def _target_size(self, h, w):
        if self.resize_mode == 'fix':
            return self.min_size, self.min_size
        if self.resize_mode == 'ratio':
            scale_f = self.min_size / min(h, w)
            if scale_f * max(h, w) > self.max_size:
                scale_f = self.max_size / max(h, w)
            return int(round(w * scale_f)), int(round(h * scale_f))
        if self.resize_mode == 'scale':
            return int(round(w * self.scale_factor)), int(round(h * self.scale_factor))
        raise ValueError(self.resize_mode)

    def __call__(self, data):
        h, w = data['img'].shape[:2]
        tw, th = self._target_size(h, w)
        data['img'] = cv2.resize(data['img'], (tw, th))
        for key in data['seg_fields']:
            data[key] = cv2.resize(data[key], (tw, th), interpolation=cv2.INTER_NEAREST)
        return data


class CenterCrop:

    def __init__(self, crop_size):
        if isinstance(crop_size, int):
            crop_size = (crop_size, crop_size)
        self.crop_size = crop_size

    def __call__(self, data):
        h, w = data['img'].shape[:2]
        ch, cw = self.crop_size
        dh, dw = (h - ch) // 2, (w - cw) // 2
        data['img'] = data['img'][dh:dh + ch, dw:dw + cw]
        for key in data['seg_fields']:
            data[key] = data[key][dh:dh + ch, dw:dw + cw]
        return data


class RandomFlip:

    def __init__(self, prob=None, direction='horizontal'):
        self.prob = prob if prob is not None else 0
        assert 0 <= self.prob <= 1
        if not isinstance(direction, list):
            direction = [direction]
        assert all(d in ('horizontal', 'vertical', 'diagonal') for d in direction)
        self.direction = direction

    def __call__(self, data):
        flip = np.random.rand() < self.prob
        d = self.direction[np.random.randint(0, len(self.direction))]
        if flip:
            data['img'] = _flip(data['img'], d)
            for key in data['seg_fields']:
                data[key] = _flip(data[key], d)
        return data


class RandomRotate:

    def __init__(self, prob, degree, pad_val=0, seg_pad_val=0, center=None, auto_bound=False):
        self.prob = prob
        if isinstance(degree, (int, float)):
            assert degree > 0
            degree = (-degree, degree)
        assert len(degree) == 2
        self.degree = degree
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        self.center = center

    def __call__(self, data):
        rotate = np.random.rand() < self.prob
        angle = np.random.uniform(min(*self.degree), max(*self.degree))
        if rotate:
            data['img'] = _rotate(data['img'], angle, self.pad_val, self.center)
            for key in data['seg_fields']:
                data[key] = _rotate(data[key], angle, self.seg_pad_val, self.center, cv2.INTER_NEAREST)
        return data


class RandomSparseRotate:

    def __init__(self, degree_list=(90, 180, 270), prob=0.5, pad_val=0, seg_pad_val=0, center=None, auto_bound=False):
        self.degree_list = list(degree_list)
        self.prob = prob
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        self.center = center

    def __call__(self, data):
        rotate = np.random.rand() < self.prob
        angle = self.degree_list[np.random.randint(0, len(self.degree_list))]
        if rotate:
            data['img'] = _rotate(data['img'], angle, self.pad_val, self.center)
            for key in data['seg_fields']:
                data[key] = _rotate(data[key], angle, self.seg_pad_val, self.center, cv2.INTER_NEAREST)
        return data


class RandomElasticDeform:
    """Elastic deformation: random gaussian-smoothed displacement field plus
    a random affine jitter of the corner triangle (albumentations
    ElasticTransform semantics with interpolation=0, border=constant 0)."""

    def __init__(self, prob=0.5, alpha=1, sigma=50, alpha_affine=50):
        self.prob = prob
        self.alpha = alpha
        self.sigma = sigma
        self.alpha_affine = alpha_affine

    def __call__(self, data):
        if np.random.rand() >= self.prob:
            return data
        img = data['img']
        h, w = img.shape[:2]

        # affine jitter
        center_square = np.float32((h, w)) // 2
        square_size = min(h, w) // 3
        pts1 = np.float32([
            center_square + square_size,
            [center_square[0] + square_size, center_square[1] - square_size],
            center_square - square_size,
        ])
        pts2 = pts1 + np.random.uniform(-self.alpha_affine, self.alpha_affine, size=pts1.shape).astype(np.float32)
        M = cv2.getAffineTransform(pts1, pts2)

        # displacement field
        dx = cv2.GaussianBlur((np.random.rand(h, w).astype(np.float32) * 2 - 1), (17, 17), self.sigma) * self.alpha
        dy = cv2.GaussianBlur((np.random.rand(h, w).astype(np.float32) * 2 - 1), (17, 17), self.sigma) * self.alpha
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        map_x = (x + dx).astype(np.float32)
        map_y = (y + dy).astype(np.float32)

        def _apply(arr, interp):
            out = cv2.warpAffine(arr, M, (w, h), flags=interp, borderMode=cv2.BORDER_CONSTANT, borderValue=0)
            return cv2.remap(out, map_x, map_y, interp, borderMode=cv2.BORDER_CONSTANT, borderValue=0)

        data['img'] = _apply(img, cv2.INTER_NEAREST)
        for key in data['seg_fields']:
            seg = data[key]
            dtype = seg.dtype
            out = _apply(seg.astype(np.float32), cv2.INTER_NEAREST)
            data[key] = out.astype(dtype)
        return data


class RandomCrop:

    def __init__(self, crop_size, cat_max_ratio=1.):
        assert crop_size[0] > 0 and crop_size[1] > 0
        self.crop_size = crop_size
        self.cat_max_ratio = cat_max_ratio

    def get_crop_bbox(self, img):
        margin_h = max(img.shape[0] - self.crop_size[0], 0)
        margin_w = max(img.shape[1] - self.crop_size[1], 0)
        oh = np.random.randint(0, margin_h + 1)
        ow = np.random.randint(0, margin_w + 1)
        return oh, oh + self.crop_size[0], ow, ow + self.crop_size[1]

    @staticmethod
    def crop(arr, bbox):
        y1, y2, x1, x2 = bbox
        return arr[y1:y2, x1:x2, ...]

    def __call__(self, data):
        img = data['img']
        bbox = self.get_crop_bbox(img)
        if self.cat_max_ratio < 1.:
            first_seg = data[data['seg_fields'][0]]
            for _ in range(10):
                tmp = self.crop(first_seg, bbox)
                _, cnt = np.unique(tmp, return_counts=True)
                if len(cnt) > 1 and np.max(cnt) / np.sum(cnt) < self.cat_max_ratio:
                    break
                bbox = self.get_crop_bbox(img)
        data['img'] = self.crop(img, bbox)
        for key in data['seg_fields']:
            data[key] = self.crop(data[key], bbox)
        return data


class Affine:
    """Random scale/shear/rotate/translate (albumentations Affine analog)."""

    def __init__(self, scale=(0.8, 1.2), shear=5, rotate_degree=(-180, 180), translate_frac=(0, 0.01), prob=0.5):
        self.scale = scale
        self.shear = shear if isinstance(shear, (tuple, list)) else (-shear, shear)
        self.rotate_degree = rotate_degree
        self.translate_frac = translate_frac
        self.prob = prob

    def __call__(self, data):
        if np.random.rand() >= self.prob:
            return data
        img = data['img']
        h, w = img.shape[:2]
        s = np.random.uniform(*self.scale)
        ang = np.deg2rad(np.random.uniform(*self.rotate_degree))
        sh = np.deg2rad(np.random.uniform(*self.shear))
        t = np.random.uniform(self.translate_frac[0], self.translate_frac[1], size=2) * (w, h)
        cx, cy = w / 2, h / 2
        ca, sa = np.cos(ang), np.sin(ang)
        M = np.array([
            [s * ca, -s * np.sin(ang - sh), 0],
            [s * sa, s * np.cos(ang - sh), 0],
        ], dtype=np.float64)
        # rotate about center, then translate
        M[:, 2] = [cx - M[0, 0] * cx - M[0, 1] * cy + t[0], cy - M[1, 0] * cx - M[1, 1] * cy + t[1]]
        data['img'] = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR, borderValue=0)
        for key in data['seg_fields']:
            seg = data[key]
            dtype = seg.dtype
            out = cv2.warpAffine(seg.astype(np.float32), M, (w, h), flags=cv2.INTER_NEAREST, borderValue=0)
            data[key] = out.astype(dtype)
        return data


class RandomBlur:
    """Random box / gaussian / median blur of the image."""

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, data):
        if np.random.rand() < self.prob:
            img = data['img']
            k = int(np.random.choice([3, 5, 7]))
            choice = random.randint(0, 2)
            if choice == 0:
                img = cv2.blur(img, (k, k))
            elif choice == 1:
                img = cv2.GaussianBlur(img, (k, k), 0)
            else:
                img = cv2.medianBlur(img, k)
            data['img'] = img
        return data


class Normalize:
    """/255, then optional z-score."""

    def __init__(self, mean=None, std=None, if_zscore=False):
        self.mean = np.array(mean, dtype=np.float32) if mean is not None else None
        self.std = np.array(std, dtype=np.float32) if std is not None else None
        self.if_zscore = if_zscore

    def __call__(self, data):
        img = data['img'].astype(np.float32) / 255.
        if self.if_zscore:
            img = (img - self.mean) / self.std
        data['img'] = img
        return data


class Pad:
    """Center zero-pad up to pad_size."""

    def __init__(self, pad_size):
        if isinstance(pad_size, int):
            pad_size = (pad_size, pad_size)
        self.pad_size = pad_size

    def __call__(self, data):
        img = data['img']
        h, w = img.shape[:2]
        ph = max(self.pad_size[0], h) - h
        pw = max(self.pad_size[1], w) - w
        canvas = np.zeros((h + ph, w + pw, img.shape[2]), dtype=img.dtype)
        canvas[ph // 2:ph // 2 + h, pw // 2:pw // 2 + w] = img
        data['img'] = canvas
        for key in data['seg_fields']:
            seg = data[key]
            extra = seg.shape[2:]
            seg_canvas = np.zeros((h + ph, w + pw, *extra), dtype=seg.dtype)
            seg_canvas[ph // 2:ph // 2 + h, pw // 2:pw // 2 + w] = seg
            data[key] = seg_canvas
        return data


class Identity:

    def __call__(self, data):
        return data
