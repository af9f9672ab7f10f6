#!/usr/bin/env python
"""Plot training/validation curves from a work_dir's log.jsonl (the
TrainingCurveHook analog, reference: tiseg/utils/hooks/training_curve.py).

Usage: python tools/plot_curves.py <work_dir/log.jsonl> [--out curves.png]
"""
import argparse
import json
import os.path as osp


def main():
    p = argparse.ArgumentParser('Plot training curves')
    p.add_argument('log_path')
    p.add_argument('--out', default=None)
    args = p.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    train, val = [], []
    with open(args.log_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            (train if r.get('mode') == 'train' else val).append(r)

    fig, axes = plt.subplots(1, 3, figsize=(18, 5))
    if train:
        xs = list(range(len(train)))
        axes[0].plot(xs, [r.get('loss') for r in train])
        axes[0].set_title('train loss')
        dice_key = next((k for k in train[0] if 'tdice' in k), None)
        if dice_key:
            axes[1].plot(xs, [r.get(dice_key) for r in train])
            axes[1].set_title(f'train {dice_key}')
    if val:
        xs = [r.get('epoch', i) for i, r in enumerate(val)]
        for key in ('mAji', 'mDice', 'mPQ'):
            if key in val[0]:
                axes[2].plot(xs, [r.get(key) for r in val], label=key)
        axes[2].legend()
        axes[2].set_title('validation')
    for ax in axes:
        ax.grid(alpha=0.3)
    out = args.out or osp.join(osp.dirname(args.log_path), 'curves.png')
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f'saved {out}')


if __name__ == '__main__':
    main()
