#!/usr/bin/env python
"""Average the last N validation epochs from a work_dir's log.jsonl — the
readme-table protocol (reference: tools/log_analysis.py:9-60, mean of last
5 val epochs).

Usage: python tools/log_analysis.py <work_dir/log.jsonl> [--last 5]
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from tiseg_tpu.utils import ascii_table  # noqa: E402


def main():
    p = argparse.ArgumentParser('Average last-N val epochs from log.jsonl')
    p.add_argument('log_path')
    p.add_argument('--last', type=int, default=5)
    args = p.parse_args()

    records = []
    with open(args.log_path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    vals = [r for r in records if r.get('mode') == 'val']
    if not vals:
        print('no validation records found')
        return
    tail = vals[-args.last:]
    keys = [k for k in tail[0] if k not in ('mode', 'epoch', 'iter')]
    means = {k: np.mean([r[k] for r in tail if k in r]) for k in keys}
    print(f'average of last {len(tail)} val epochs '
          f'(epochs {[r.get("epoch", r.get("iter")) for r in tail]}):')
    print(ascii_table(keys, [[round(means[k], 2) for k in keys]]))


if __name__ == '__main__':
    main()
