"""Converter tests on synthetic raw data (MoNuSeg XML contours, CPM17-style
crops)."""
import os
import os.path as osp
import subprocess
import sys

import cv2
import numpy as np
import pytest

TOOLS = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), 'tools', 'convert_dataset')
sys.path.insert(0, TOOLS)


def _write_xml(path, contours):
    regions = '\n'.join('<Region><Vertices>' +
                        ''.join(f'<Vertex X="{x}" Y="{y}"/>' for x, y in c) +
                        '</Vertices></Region>' for c in contours)
    with open(path, 'w') as f:
        f.write(f'<Annotations><Annotation><Regions>{regions}</Regions></Annotation></Annotations>')


def test_monuseg_contours_and_crops(tmp_path):
    from monuseg import contours_to_instance, extract_contours
    from _common import crop_patches

    xml = str(tmp_path / 'a.xml')
    square = [(10, 10), (30, 10), (30, 30), (10, 30)]
    tri = [(50, 50), (70, 50), (60, 70)]
    _write_xml(xml, [square, tri])
    contours = extract_contours(xml)
    assert len(contours) == 2
    inst = contours_to_instance(contours, 100, 100)
    assert inst[20, 20] == 1 and inst[55, 60] == 2 and inst[0, 0] == 0

    patches = crop_patches(np.zeros((1000, 1000, 3), np.uint8), 512, 256)
    assert all(p.shape == (512, 512, 3) for p in patches)
    assert len(patches) >= 9


def test_monuseg_end_to_end(tmp_path):
    # synthetic raw layout
    raw = tmp_path / 'monuseg' / 'MoNuSeg 2018 Training Data'
    (raw / 'Tissue Images').mkdir(parents=True)
    (raw / 'Annotations').mkdir(parents=True)
    test_raw = tmp_path / 'monuseg' / 'MoNuSegTestData'
    test_raw.mkdir(parents=True)

    from monuseg import SPLIT_DICT
    rng = np.random.default_rng(0)
    for item in SPLIT_DICT['train'][:2] + SPLIT_DICT['val'][:1]:
        img = rng.integers(0, 255, (100, 100, 3)).astype(np.uint8)
        cv2.imwrite(str(raw / 'Tissue Images' / f'{item}.tif'), img)
        _write_xml(str(raw / 'Annotations' / f'{item}.xml'), [[(10, 10), (30, 10), (30, 30), (10, 30)]])
    for item in SPLIT_DICT['test1'][:1]:
        img = rng.integers(0, 255, (100, 100, 3)).astype(np.uint8)
        cv2.imwrite(str(test_raw / f'{item}.tif'), img)
        _write_xml(str(test_raw / f'{item}.xml'), [[(10, 10), (30, 10), (30, 30), (10, 30)]])

    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run([sys.executable, osp.join(TOOLS, 'monuseg.py'), str(tmp_path), 'only-train_t12_v4',
                        '-w', '64', '-s', '32', '--nproc', '1'], capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert osp.exists(str(tmp_path / 'only-train_t12_v4_train_w64_s32.txt'))
    train_dir = tmp_path / 'train' / 'w64_s32'
    tifs = [f for f in os.listdir(train_dir) if f.endswith('.tif')]
    assert len(tifs) > 0
    # triplet contract
    stem = tifs[0][:-4]
    assert osp.exists(str(train_dir / f'{stem}_sem.png'))
    assert osp.exists(str(train_dir / f'{stem}_inst.npy'))
    inst = np.load(str(train_dir / f'{stem}_inst.npy'))
    assert inst.dtype == np.int32


def test_crop_patches_matches_reference_transcription():
    """The idiomatic crop_patches must emit the BIT-identical patch list of
    the reference routine (tools/convert_dataset/monuseg.py:108-151 in the
    upstream repo) — dataset bit parity depends on it. The oracle below is
    a direct transcription kept ONLY as this test's fixture; note its
    remainder branches are unreachable (floor(x/s)+1 == floor((x+s)/s)),
    which is why the shipped implementation is a plain window grid."""
    import math

    from _common import crop_patches

    def oracle(image, w_size, s_size):
        patches = []
        diff = w_size - s_size
        pad1, pad2 = diff // 2, diff - diff // 2
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

    rng = np.random.default_rng(0)
    cases = [((1000, 1000, 3), 512, 256),   # MoNuSeg train recipe
             ((1000, 1000), 512, 256),      # 2-D (inst/sem maps)
             ((1000, 1000, 3), 300, 200),   # non-divisible remainder
             ((517, 301, 3), 256, 192),     # ragged sizes
             ((100, 100, 3), 512, 256),     # image smaller than window
             ((256, 256), 256, 256)]        # stride == window (no pad)
    for shape, w, s in cases:
        img = rng.integers(0, 255, shape).astype(np.uint8)
        got, want = crop_patches(img, w, s), oracle(img, w, s)
        assert len(got) == len(want), (shape, w, s)
        for g, o in zip(got, want):
            np.testing.assert_array_equal(g, o, err_msg=str((shape, w, s)))
