#!/usr/bin/env python
"""Aggregate per-op device time from a jax.profiler trace (xplane.pb).

The TensorBoard profile plugin in this image can't parse xplanes (TF/proto
version skew), so this reads the raw XSpace proto and sums the '/device:TPU'
'XLA Ops' line: total device-busy time per HLO op across all captured runs,
top-N table with op category, plus a fusion/copy rollup. This is the
op-level tracing surface of the framework (SURVEY.md §5 tracing/profiling).

Usage:
  python tools/trace_ops.py /tmp/tiseg_trace [--top 40] [--runs N]

Capture a trace with tools/profile_model.py or:
  with jax.profiler.trace(dir): jax.block_until_ready(f(...))
"""
import argparse
import collections
import glob
import os
import sys


def load_xspace(trace_dir: str):
    os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: installed with tf-cpu
    paths = sorted(glob.glob(os.path.join(trace_dir, 'plugins/profile/*/*.xplane.pb')))
    if not paths:
        paths = sorted(glob.glob(os.path.join(trace_dir, '*.xplane.pb')))
    if not paths:
        raise SystemExit(f'no *.xplane.pb under {trace_dir}')
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], 'rb').read())
    return xs


def device_op_times(xs, line_name: str = 'XLA Ops'):
    """{op_display_name: (total_ps, count)} over every device plane."""
    out = collections.defaultdict(lambda: [0, 0])
    n_modules = 0
    for plane in xs.planes:
        if not plane.name.startswith('/device:'):
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name == 'XLA Modules':
                n_modules += len(line.events)
            if line.name != line_name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                out[name][0] += ev.duration_ps
                out[name][1] += 1
    return out, n_modules


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('trace_dir')
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--runs', type=int, default=0,
                    help='divide totals by N runs (default: # XLA Module executions)')
    args = ap.parse_args()
    xs = load_xspace(args.trace_dir)
    times, n_modules = device_op_times(xs)
    runs = args.runs or max(n_modules, 1)
    rows = sorted(times.items(), key=lambda kv: -kv[1][0])
    total_ms = sum(v[0] for v in times.values()) / 1e9 / runs
    print(f'{len(rows)} ops, {runs} module runs, device-busy {total_ms:.3f} ms/run')
    print(f'{"ms/run":>9} {"%":>5} {"count":>5}  op')
    for name, (ps, cnt) in rows[:args.top]:
        ms = ps / 1e9 / runs
        print(f'{ms:9.3f} {100 * ms / max(total_ms, 1e-9):5.1f} {cnt // runs:5d}  {name[:110]}')
    # category rollup by HLO opcode prefix (fusion kinds, convs, copies)
    cats = collections.defaultdict(float)
    for name, (ps, cnt) in rows:
        base = name.split('.')[0].split(' ')[0]
        for pre in ('fusion', 'convolution', 'copy', 'transpose', 'reduce-window',
                    'dynamic-update-slice', 'dynamic-slice', 'reduce', 'convert',
                    'bitcast', 'broadcast', 'concatenate', 'pad', 'slice'):
            if base.startswith(pre) or name.startswith('%' + pre):
                cats[pre] += ps / 1e9 / runs
                break
        else:
            cats['other'] += ps / 1e9 / runs
    print('\ncategory rollup (ms/run):')
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f'  {k:22s} {v:8.3f}')


if __name__ == '__main__':
    main()
