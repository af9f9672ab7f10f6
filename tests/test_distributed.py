"""REAL 2-process distributed run on localhost CPU (VERDICT r4 item 6).

Two subprocesses join through ``jax.distributed.initialize`` (2 local CPU
devices each -> 4 global), train a sharded UNet and evaluate rank-sharded
with gather_object_shards; a 1-process/4-device control runs the same
schedule. The eval at deterministic init weights must merge to EXACTLY the
control's metrics; the sharded training losses must match the control's
closely (same global batches, different process topology). This replaces
the monkeypatched-allgather-only coverage of gather_object_shards
(reference analog: tools/dist_train.sh + apis/test.py collect_results).
"""
import json
import os
import socket
import subprocess
import sys
import os.path as osp

import numpy as np
import pytest

from test_datasets import make_mini_dataset

WORKER = osp.join(osp.dirname(osp.abspath(__file__)), 'distributed_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(local_devices):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={local_devices}'
    env.pop('JAX_COMPILATION_CACHE_DIR', None)
    return env


@pytest.mark.slow
def test_two_process_train_eval_matches_single(tmp_path):
    root = str(tmp_path / 'ds')
    make_mini_dataset(root, n=8, hw=64)

    # control: 1 process x 4 devices
    out1 = str(tmp_path / 'w1_r0.json')
    r = subprocess.run([sys.executable, WORKER, '--rank', '0', '--world', '1', '--port', '0',
                        '--data-root', root, '--out', out1],
                       env=_env(4), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    # 2 processes x 2 devices
    port = _free_port()
    outs = [str(tmp_path / f'w2_r{i}.json') for i in range(2)]
    procs = [subprocess.Popen([sys.executable, WORKER, '--rank', str(i), '--world', '2',
                               '--port', str(port), '--data-root', root, '--out', outs[i]],
                              env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True) for i in range(2)]
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), '\n'.join(e[-3000:] for e in errs)

    ctrl = json.load(open(out1))
    r0 = json.load(open(outs[0]))
    r1 = json.load(open(outs[1]))

    # each process evaluated a disjoint half and the gather merged all 8
    assert r0['n_local'] == r1['n_local'] == 4
    assert r0['n_merged'] == r1['n_merged'] == 8 == ctrl['n_merged']

    # merged evaluate() at deterministic init == the single-process run
    assert set(ctrl['metrics']) == set(r0['metrics'])
    for k, v in ctrl['metrics'].items():
        got = r0['metrics'][k]
        if np.isnan(v):
            assert np.isnan(got), k
        else:
            np.testing.assert_allclose(got, v, rtol=1e-6, err_msg=k)

    # sharded training follows the control's loss trajectory (same global
    # batches; cross-process reduction order may differ in the last ulps)
    assert len(ctrl['losses']) == len(r0['losses']) == 4  # 8 imgs / gb 4 * 2 epochs
    np.testing.assert_allclose(r0['losses'], ctrl['losses'], rtol=2e-3)
