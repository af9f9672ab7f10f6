#!/usr/bin/env python
"""Aggregate pickled eval results across checkpoints (reference: tools/
benchmark_analysis.py:9-76).

Usage: python tools/benchmark_analysis.py <work_dir/eval>
"""
import argparse
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from tiseg_tpu.utils import ascii_table  # noqa: E402


def main():
    p = argparse.ArgumentParser('Aggregate checkpoint eval pickles')
    p.add_argument('eval_dir')
    args = p.parse_args()

    rows = []
    keys = None
    per_key = {}
    for fname in sorted(os.listdir(args.eval_dir)):
        if not fname.endswith('.p') or fname == 'sweep_summary.p':
            continue
        with open(osp.join(args.eval_dir, fname), 'rb') as f:
            storage = pickle.load(f)
        metrics = dict(storage.get('overall_metrics', {}))
        metrics.update(storage.get('mean_metrics', {}))
        if keys is None:
            keys = list(metrics)
        rows.append([fname.replace('.p', '')] + [metrics.get(k, float('nan')) for k in keys])
        for k, v in metrics.items():
            per_key.setdefault(k, []).append(v)
    if not rows:
        print('no eval pickles found')
        return
    rows.append(['MEAN'] + [round(float(np.mean(per_key[k])), 2) for k in keys])
    print(ascii_table(['checkpoint'] + keys, rows))


if __name__ == '__main__':
    main()
