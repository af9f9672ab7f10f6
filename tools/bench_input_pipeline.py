"""Input-pipeline (dataloader map stage) throughput per model family.

Measures the full train-time transform list from each family's monuseg
config (file IO and Formatting excluded) on synthetic 256^2 nuclei images,
printing ms/item and items/s/core — the number that decides how many
dataloader workers one chip needs (compare against the device step rate
from ``BENCH_TRAIN=1 python bench.py``).

The label-map generators are the measured binder (reference numba twins:
tiseg/datasets/ops/*_map.py); their native C++ kernels live in
tiseg_tpu/native/labelmaps.cpp with numpy fallbacks.

Usage: python tools/bench_input_pipeline.py [family ...]
"""
import argparse
import copy
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

FAMILIES = ['unet', 'cunet', 'cdnet', 'hovernet', 'dist', 'micronet', 'fullnet']


def synth(hw=256, seed=0):
    """One map-stage input item on the SAME workload the device benches use
    (bench.make_bench_nuclei, MoNuSeg density ~150 nuclei / 256²) so
    items/s/core here is directly comparable to patches/s/chip there."""
    from bench import make_bench_nuclei
    img, sem, inst = make_bench_nuclei(seed, hw=hw)
    return {'img': (img * 255).astype(np.uint8), 'inst_gt': inst.astype(np.int32),
            'sem_gt': sem.astype(np.int32),
            'seg_fields': ['sem_gt', 'inst_gt'], 'data_info': {'ori_hw': (hw, hw)}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('families', nargs='*', default=FAMILIES)
    ap.add_argument('--items', type=int, default=8)
    ap.add_argument('--hw', type=int, default=256)
    args = ap.parse_args()

    from tiseg_tpu.datasets.ops import class_dict
    from tiseg_tpu.utils import Config

    ds = [synth(hw=args.hw, seed=i) for i in range(args.items)]
    for fam in args.families:
        cfg_path = osp.join(osp.dirname(__file__), '..', 'configs', fam, 'monuseg.py')
        if not osp.exists(cfg_path):
            print(f'{fam:10s} (no monuseg config)')
            continue
        cfg = Config.fromfile(cfg_path)
        ops = []
        for p in cfg['train_processes']:
            p = dict(p)
            t = p.pop('type')
            if t == 'Formatting':
                continue
            ops.append(class_dict[t](**p))

        def run(d):
            for op in ops:
                d = op(d)

        run(copy.deepcopy(ds[0]))  # warm caches / lazy native build
        t0 = time.perf_counter()
        for d in ds:
            run(copy.deepcopy(d))
        dt = (time.perf_counter() - t0) / len(ds)
        print('%-10s %7.1f ms/item  %6.1f items/s/core' % (fam, dt * 1000, 1 / dt))


if __name__ == '__main__':
    main()
