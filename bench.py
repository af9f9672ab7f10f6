"""End-to-end inference benchmark: 256x256 patches/sec/chip through the
flagship model — the FUSED single-jit eval program (network forward +
argmax + on-device instance post-processing: fill holes, CCL, disk
dilation), i.e. the artifact `inference_and_postprocess` users run.

Measurement notes (the dev tunnel's remote dispatch makes naive
block_until_ready timing unreliable):
- everything is timed as ONE jit program chaining ITERS evals with a
  data dependency — pipelining/caching cannot inflate it — and the
  measured RPC latency of a trivial program is subtracted (methodology
  validated against a chain-length linear fit, docs/ROUND3.md);
- the workload is representative: MoNuSeg-density synthetic nuclei
  images (150/image, fg ~0.18) through a briefly-trained net, so the
  sem argmax plane the sweep post-processor consumes has realistic CCL
  structure (~2.5k row transitions/image). Noise input is pathological
  (26k transitions, -7%) and an untrained net on nuclei predicts almost
  no foreground (+5%): docs/ROUND3.md "headline reconciliation".

The headline path auto-selects the int8 post-training-quantized network
(heads/quant_decode.py; v5e int8 MXU peak is 2x bf16) when an inline
instance-level accuracy gate passes: the SAME fused program is run in
bf16 and int8 on held-out images (seeds disjoint from the calibration /
throughput batch) and int8 must cost <= 0.5 Aji points (x100) vs bf16.
Gate details go to stderr; the metric line carries an `_int8` suffix so
the selected path is always visible. BENCH_INT8_E2E=0 forces bf16,
=1 forces int8 (skips the gate).

Target (BASELINE.md): >= 5,000 patches/sec/chip net+post-proc on v5e.
Prints ONE JSON line (last line): {"metric", "value", "unit", "vs_baseline"}.

Budget robustness (VERDICT r3 item 1 — the round-3 driver bench timed
out): the default path loads the committed `bench_fixture.npz` (briefly-
trained weights + int8 tree + recorded held-out gate verdict, built by
`python bench.py --make-fixture`), so a cold run costs device init + ONE
fused-program compile + 3 timed reps. A BENCH_DEADLINE watchdog (default
420 s, '0' disables) emits the best metric measured so far rather than
letting the driver record a timeout; the persistent compile cache lives
in the repo (.jax_cache/, survives /tmp cleanups). BENCH_FIXTURE=0
forces the legacy build-everything-in-process path.
"""
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_PATCHES_PER_SEC = 5000.0

# In-repo bench fixture: the briefly-trained flagship weights + the int8
# parameter tree + the held-out accuracy-gate decision, precomputed by
# `python bench.py --make-fixture` and committed. The driver bench then
# runs load -> ONE fused-program compile -> measure, so a cold compile
# cache costs ~1 program compile instead of the whole train/calibrate/gate
# pipeline (BENCH_r03 timed out exactly there — VERDICT r3 item 1).
FIXTURE_PATH = os.path.join(REPO, 'bench_fixture.npz')

# Best metric measured so far; the deadline watchdog emits it if the run
# would otherwise overshoot the driver budget and record nothing.
_BEST = {}


def _arm_watchdog():
    """Emit the best-so-far metric and exit when BENCH_DEADLINE (seconds,
    default 420, '0' disables) elapses. A partial-but-real number always
    beats the rc=124/nothing the driver records on a timeout; if nothing
    was measured yet there is nothing honest to print and we exit 4."""
    import threading
    spec = os.environ.get('BENCH_DEADLINE', '420')
    if spec == '0':
        return
    deadline = float(spec)

    def _fire():
        time.sleep(deadline)
        if _BEST:
            print(json.dumps(_BEST), flush=True)
            print('bench.py: BENCH_DEADLINE %.0fs hit — emitted best-so-far metric'
                  % deadline, file=sys.stderr, flush=True)
            os._exit(0)
        print('bench.py: BENCH_DEADLINE %.0fs hit with no metric measured — '
              'nothing to emit' % deadline, file=sys.stderr, flush=True)
        os._exit(4)

    threading.Thread(target=_fire, daemon=True).start()


def _setup_cache():
    """Persistent XLA compile cache in a repo-local dir (survives /tmp
    cleanups between sessions; the driver runs bench.py from the repo)."""
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.environ.get('JAX_CACHE_DIR', os.path.join(REPO, '.jax_cache')))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def require_device(timeout_s=None):
    """Fail FAST (exit 3) if the accelerator backend cannot initialize.

    With the axon tunnel down, the first backend touch (`jax.devices()`)
    blocks forever in a silent reconnect loop — a driver-side `timeout`
    would then record a hang instead of a diagnosable failure. Probe the
    backend in a daemon thread with a deadline; on timeout print a clear
    error to stderr and exit WITHOUT emitting a metric line (never a
    fabricated number)."""
    import threading
    timeout_s = timeout_s or float(os.environ.get('BENCH_DEVICE_TIMEOUT', 300))
    state = {}
    done = threading.Event()

    def _probe():
        try:
            import jax
            # the sitecustomize axon plugin ignores the JAX_PLATFORMS env;
            # translate it like tiseg_tpu/__init__.py does so CPU test runs
            # don't probe (and hang on) the tunnel
            if os.environ.get('JAX_PLATFORMS'):
                try:
                    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
                except Exception:
                    pass
            state['platform'] = jax.devices()[0].platform
        except Exception as e:  # init error is as terminal as a hang
            state['err'] = e
        done.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not done.wait(timeout_s) or 'err' in state:
        print('bench.py: device backend failed to initialize within %.0fs (%s) — '
              'TPU tunnel down? No metric emitted.'
              % (timeout_s, state.get('err', 'hang')), file=sys.stderr, flush=True)
        os._exit(3)
    return state['platform']


def jit_tuned(fn, *example_args):
    """jit with the measured-best TPU compiler options (v5e flag hunt,
    docs/ROUND3.md: scoped VMEM 64MB gives +2.4% on the UNet forward —
    2800 -> 2866 p/s; 32MB +2.0%, 96MB/128MB regress). Falls back to plain
    jit where options are rejected (CPU tests)."""
    import jax
    opts = {'xla_tpu_scoped_vmem_limit_kib': os.environ.get('BENCH_VMEM_KIB', '65536')}
    try:
        return jax.jit(fn).lower(*example_args).compile(compiler_options=opts)
    except Exception:
        return jax.jit(fn)


def make_bench_nuclei(seed, hw=256, n_inst=150):
    """Synthetic H&E-like nuclei image at MoNuSeg density (~150 nuclei /
    256², fg ~0.18). bbox-local ellipse drawing keeps generation O(n·r²).
    Returns (img float32 (hw,hw,3) in [0,1], sem uint8, inst int32)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    inst = np.zeros((hw, hw), np.int32)
    nid = 0
    for _ in range(n_inst):
        cy, cx = rng.integers(8, hw - 8, 2)
        a, b = rng.uniform(3.5, 7.5, 2)
        th = rng.uniform(0, np.pi)
        r = int(np.ceil(max(a, b))) + 1
        yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
        ry = yy * np.cos(th) + xx * np.sin(th)
        rx = -yy * np.sin(th) + xx * np.cos(th)
        m = (ry / a) ** 2 + (rx / b) ** 2 <= 1.0
        y0, y1 = max(cy - r, 0), min(cy + r + 1, hw)
        x0, x1 = max(cx - r, 0), min(cx + r + 1, hw)
        m = m[y0 - (cy - r):m.shape[0] - ((cy + r + 1) - y1),
              x0 - (cx - r):m.shape[1] - ((cx + r + 1) - x1)]
        win = inst[y0:y1, x0:x1]
        if (win[m] > 0).mean() > 0.25:
            continue
        nid += 1
        win[m & (win == 0)] = nid
    sem = (inst > 0).astype(np.uint8)
    img = np.empty((hw, hw, 3), np.float32)
    img[..., 0] = 0.80 - 0.42 * sem
    img[..., 1] = 0.55 - 0.35 * sem
    img[..., 2] = 0.75 - 0.18 * sem
    img = np.clip(img + rng.normal(0, 0.06, (hw, hw, 3)), 0, 1).astype(np.float32)
    return img, sem, inst


def _bench_labels(typ: str, data):
    """Per-model training label dict (numpy) from (img, sem, inst) items,
    via the same label-map ops the data pipeline uses."""
    import numpy as np
    from tiseg_tpu.datasets.ops.label_maps import (BoundLabelMake, DirectionLabelMake,
                                                   HVLabelMake, UNetLabelMake)
    items = []
    for img, sem, inst in data:
        d = {'sem_gt': sem.astype(np.int32), 'inst_gt': inst, 'seg_fields': ['sem_gt']}
        if typ == 'CDNet':
            d = BoundLabelMake(edge_id=2, selem_radius=(3, 3))(d)
            d = DirectionLabelMake()(d)
        elif typ == 'HoverNet':
            d = HVLabelMake()(d)
        else:
            d = UNetLabelMake()(d)
        items.append(d)
    st = lambda k, dt: np.stack([it[k] for it in items]).astype(dt)
    if typ == 'CDNet':
        return {'sem_gt_w_bound': st('sem_gt_w_bound', np.int32),
                'dir_gt': st('dir_gt', np.int32), 'point_gt': st('point_gt', np.float32)}
    if typ == 'HoverNet':
        return {'sem_gt': st('sem_gt', np.int32), 'hv_gt': st('hv_gt', np.float32)}
    return {'sem_gt_inner': st('sem_gt_inner', np.int32),
            'loss_weight_map': st('loss_weight_map', np.float32)}


def train_briefly(seg, variables, typ='UNet', hw=256, steps=60, n_imgs=16, lr=1e-3):
    """~60 Adam steps on synthetic nuclei so the bench model actually
    segments (fg ~0.18 out, matching label stats) instead of an untrained
    net's near-empty prediction. Deterministic (fixed seeds/order); the
    step compile lands in the persistent cache. Returns trained variables."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    data = [make_bench_nuclei(10_000 + i, hw=hw) for i in range(n_imgs)]
    timg = jnp.asarray(np.stack([d[0] for d in data]))
    tlabel = {k: jnp.asarray(v) for k, v in _bench_labels(typ, data).items()}
    params, batch_stats = variables['params'], variables['batch_stats']
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def step(params, batch_stats, opt_state, img, label):
        def loss_fn(p):
            batch = {'data': {'img': img}, 'label': label}
            total, (logs, new_state) = seg.loss({'params': p, 'batch_stats': batch_stats},
                                                batch, rng=jax.random.PRNGKey(0))
            return total, new_state['batch_stats']

        (total, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_bs, opt_state2, total

    step_j = jit_tuned(step, params, batch_stats, opt_state, timg, tlabel)
    for _ in range(steps):
        params, batch_stats, opt_state, total = step_j(params, batch_stats, opt_state, timg, tlabel)
    jax.block_until_ready(total)
    return {'params': params, 'batch_stats': batch_stats}


def _heldout_aji(seg, variables, int8: bool, n=16, seed0=200):
    """Binary AJI (x100) of the shipped fused program on HELD-OUT images
    (seeds disjoint from the calibration and throughput batches —
    seed0=200 vs 0..15): device `inst_pred` scored against the synthetic
    GT with the host AJI reducer."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tiseg_tpu.utils.metrics.inst_metrics import pre_eval_bin_aji, pre_eval_to_bin_aji
    data = [make_bench_nuclei(seed0 + i) for i in range(n)]
    img = jnp.asarray(np.stack([d[0] for d in data]))
    prev = seg.test_cfg.get('int8_eval', False)
    seg.test_cfg['int8_eval'] = int8
    inst = np.asarray(jax.jit(
        lambda v, im: seg.inference_and_postprocess(v, im)['inst_pred'])(variables, img))
    seg.test_cfg['int8_eval'] = prev
    ajis = [pre_eval_bin_aji(inst[i].astype(np.int32), data[i][2]) for i in range(n)]
    return round(float(pre_eval_to_bin_aji(ajis)['Aji']) * 100, 3)


def _int8_accuracy_gate(seg, variables, tol_pts=0.5, n=16, seed0=200):
    """bf16 vs int8 of the same model on the held-out workload. Returns
    (ok, detail): ok means int8 costs <= tol_pts Aji (x100) vs bf16."""
    detail = {'bf16_aji': _heldout_aji(seg, variables, False, n, seed0),
              'int8_aji': _heldout_aji(seg, variables, True, n, seed0)}
    ok = detail['int8_aji'] >= detail['bf16_aji'] - tol_pts
    return ok, detail


def _flatten_tree(tree, prefix):
    from flax.traverse_util import flatten_dict
    return {prefix + '/' + '/'.join(k): v for k, v in flatten_dict(tree).items()}


def _unflatten_keys(d):
    from flax.traverse_util import unflatten_dict
    return unflatten_dict({tuple(k.split('/')): v for k, v in d.items()})


def _round_f16(variables):
    """Round params through the f16 storage dtype (gate what ships)."""
    import jax
    import numpy as np
    params = jax.tree.map(lambda x: np.asarray(x).astype(np.float16).astype(np.float32),
                          jax.device_get(variables['params']))
    batch_stats = jax.device_get(variables['batch_stats'])
    return {'params': jax.device_put(params), 'batch_stats': jax.device_put(batch_stats)}


def _fixture_arrays(variables, fpq, prefix=''):
    import jax
    import numpy as np
    arrays = {}
    arrays.update({k: np.asarray(v).astype(np.float16)
                   for k, v in _flatten_tree(jax.device_get(variables['params']),
                                             prefix + 'p').items()})
    arrays.update({k: np.asarray(v)
                   for k, v in _flatten_tree(jax.device_get(variables['batch_stats']),
                                             prefix + 'bs').items()})
    fpq = jax.device_get(fpq)
    arrays.update({f'{prefix}act/{k}': np.asarray(v, np.float32) for k, v in fpq['act'].items()})
    for k, (q, s) in fpq['wq'].items():
        arrays[f'{prefix}wq/{k}'] = np.asarray(q)
        arrays[f'{prefix}ws/{k}'] = np.asarray(s, np.float32)
    return arrays


def save_bench_fixture(path=FIXTURE_PATH):
    """Build and save the headline-bench fixture.

    Both the standard UNet and the UNet-S2D performance variant are trained
    briefly on the synthetic-nuclei workload and gated on held-out crops,
    but only the VARIANT'S weights + int8 tree ship in the fixture (the
    standard model's role is the accuracy reference, whose held-out Aji is
    recorded in the meta — storing its ~50 MB of weights too doubled the
    fixture for a fallback the gates never picked; VERDICT r4 item 7 size
    diet). `python bench.py` re-scores the s2d bf16/int8 gate LIVE and
    additionally sanity-checks the live bf16 score against the recorded
    one, so neither an int8 nor a bf16 executor regression can ride a
    stale verdict. Escape hatches: BENCH_S2D=0 / BENCH_FIXTURE=0 fall back
    to the legacy train-in-place standard-UNet path."""
    import jax
    import numpy as np

    import jax.numpy as jnp
    from tiseg_tpu.models import build_segmentor
    test_cfg = dict(mode='whole', device_postprocess=True, radius=1)
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=test_cfg),
                          dtype=jnp.bfloat16)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(256, 256))
    variables = _round_f16(train_briefly(seg, variables))
    std_bf16_aji = _heldout_aji(seg, variables, False)

    B = int(os.environ.get('BENCH_BATCH', 128))
    uniq = np.stack([make_bench_nuclei(i)[0] for i in range(16)])
    img_r = jnp.asarray(np.tile(uniq, (max(B // 16, 1), 1, 1, 1))[:B])

    # the numerics-changing s2d-stem variant: trained from scratch on the
    # same schedule/data, admitted only within the gate tolerance of the
    # standard bf16 model on the held-out workload
    seg2 = build_segmentor(dict(type='UNetS2D', num_classes=2, train_cfg=dict(),
                                test_cfg=dict(test_cfg)), dtype=jnp.bfloat16)
    v2 = seg2.init_variables(jax.random.PRNGKey(1), hw=(256, 256))
    v2 = _round_f16(train_briefly(seg2, v2))
    fpq2 = seg2.calibrate_int8(v2, img_r)
    tol = 0.5
    s2d_gate = {'std_bf16_aji': std_bf16_aji,
                's2d_bf16_aji': _heldout_aji(seg2, v2, False),
                's2d_int8_aji': _heldout_aji(seg2, v2, True)}
    s2d_gate['int8_selected'] = s2d_gate['s2d_int8_aji'] >= std_bf16_aji - tol
    s2d_gate['bf16_selected'] = s2d_gate['s2d_bf16_aji'] >= std_bf16_aji - tol

    arrays = _fixture_arrays(v2, fpq2, prefix='s2d_')
    meta = {'version': 3, 'model': 'UNetS2D', 's2d': s2d_gate}
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
    print(json.dumps({'fixture': path, 'bytes': os.path.getsize(path), **meta}),
          file=sys.stderr, flush=True)
    return path


def _load_tree(z, prefix):
    import jax
    import numpy as np
    p, bs, act, wq, ws = {}, {}, {}, {}, {}
    routes = {prefix + 'p/': p, prefix + 'bs/': bs, prefix + 'act/': act,
              prefix + 'wq/': wq, prefix + 'ws/': ws}
    for k in z.files:
        for pre, d in routes.items():
            if k.startswith(pre):
                v = z[k]
                d[k[len(pre):]] = v.astype(np.float32) if d is p and v.dtype == np.float16 else v
                break
    if not p:
        return None, None
    variables = jax.device_put({'params': _unflatten_keys(p), 'batch_stats': _unflatten_keys(bs)})
    fpq = jax.device_put({'act': act, 'wq': {k: (wq[k], ws[k]) for k in wq}})
    return variables, fpq


def load_bench_fixture(path=FIXTURE_PATH):
    """Load the committed bench fixture -> (variables, fpq, meta dict,
    s2d_variables, s2d_fpq — None on v1 fixtures). Arrays go to device in
    one put per tree; params are f16-on-disk, f32 in memory (the exact
    values the fixture's gates scored)."""
    import numpy as np
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z['__meta__']))
    variables, fpq = _load_tree(z, '')
    s2d_v, s2d_fpq = _load_tree(z, 's2d_')
    return variables, fpq, meta, s2d_v, s2d_fpq


def main():
    _setup_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tiseg_tpu.models import build_segmentor

    t_start = time.time()

    def _stage(name):
        print(json.dumps({'stage': name, 't': round(time.time() - t_start, 1)}),
              file=sys.stderr, flush=True)

    # shipped post-proc defaults (pp_sweeps 16 / pp_fill_sweeps 32: exact on
    # all 16 trained-net planes vs the host oracle, and only -0.6% vs the
    # truncated sweeps=8 setting — the sweep loops exit at their fixpoint)
    test_cfg = dict(mode='whole', device_postprocess=True, radius=1)
    # '0' forces bf16, '1' forces int8 (no gate), unset/'auto' uses the
    # held-out accuracy-gate verdict (fixture-recorded, or run live on the
    # legacy no-fixture path — docstring above)
    int8_mode = os.environ.get('BENCH_INT8_E2E', 'auto')
    int8_e2e = int8_mode == '1'
    if os.environ.get('BENCH_PP_SWEEPS'):
        test_cfg['pp_sweeps'] = int(os.environ['BENCH_PP_SWEEPS'])
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=test_cfg),
                          dtype=jnp.bfloat16)

    # B=128 measured best on v5e-1: net 2785 p/s vs 2526 (B=64) / 2825 (B=256,
    # 2x memory for +1.4%) — larger batches amortize the decoder's layout copies
    B = int(os.environ.get('BENCH_BATCH', 128))
    ITERS = int(os.environ.get('BENCH_ITERS', 16))
    include_postproc = os.environ.get('BENCH_POSTPROC', '1') == '1'

    s2d_selected = False
    live_gate = None
    use_fixture = (os.environ.get('BENCH_FIXTURE', '1') == '1' and os.path.exists(FIXTURE_PATH))
    if use_fixture:
        # driver path: load the committed s2d weights + int8 tree, then
        # re-score the accuracy gate LIVE on held-out crops (VERDICT r4
        # item 7 — a post-fixture executor regression can no longer ride a
        # stale recorded verdict). The live bf16 score is also anchored
        # against BOTH recorded references (the standard model's bf16 Aji
        # and the variant's own fixture-time bf16 Aji).
        variables, fpq, meta, s2d_v, s2d_fpq = load_bench_fixture()
        _stage('fixture_loaded')
        rec = meta.get('s2d') or {}
        if s2d_v is not None and os.environ.get('BENCH_S2D', '1') != '0':
            seg = build_segmentor(dict(type='UNetS2D', num_classes=2, train_cfg=dict(),
                                       test_cfg=dict(test_cfg)), dtype=jnp.bfloat16)
            seg._int8_fpq = s2d_fpq
            variables = s2d_v
            s2d_selected = True
            if int8_mode in ('0', '1'):
                int8_e2e = int8_mode == '1'
            else:
                # pre-select from the RECORDED verdict; the LIVE re-score
                # runs AFTER the first measurement (so the watchdog always
                # has a number) and triggers a fallback re-measure on a flip
                int8_e2e = bool(rec.get('int8_selected'))

                def live_gate():
                    tol = 0.5
                    live_bf16 = _heldout_aji(seg, variables, False)
                    _stage('live_gate_bf16')
                    live_int8 = _heldout_aji(seg, variables, True)
                    _stage('live_gate_int8')
                    anchor = rec.get('std_bf16_aji', live_bf16)
                    bf16_ok = (live_bf16 >= anchor - tol
                               and live_bf16 >= rec.get('s2d_bf16_aji', live_bf16) - 1.0)
                    int8_ok = bool(bf16_ok and live_int8 >= live_bf16 - tol
                                   and live_int8 >= anchor - tol)
                    print(json.dumps({'live_gate': {'s2d_bf16_aji': live_bf16,
                                                    's2d_int8_aji': live_int8,
                                                    'recorded': rec},
                                      'bf16_anchor_ok': bf16_ok,
                                      'int8_gate_pass': int8_ok, 'fixture': True}),
                          file=sys.stderr, flush=True)
                    return bf16_ok, int8_ok
        elif variables is not None:  # legacy v1/v2 fixture: standard UNet
            seg._int8_fpq = fpq
            if int8_mode in ('0', '1'):
                int8_e2e = int8_mode == '1'
            else:
                int8_e2e = bool(meta.get('int8_selected'))

                def live_gate():
                    ref_aji = _heldout_aji(seg, variables, False)
                    live_int8 = _heldout_aji(seg, variables, True)
                    int8_ok = bool(live_int8 >= ref_aji - 0.5)
                    print(json.dumps({'live_gate': {'bf16_aji': ref_aji, 'int8_aji': live_int8},
                                      'int8_gate_pass': int8_ok, 'fixture': True}),
                          file=sys.stderr, flush=True)
                    return True, int8_ok
        else:
            use_fixture = False
        seg.test_cfg['int8_eval'] = int8_e2e
    if not use_fixture:
        variables = seg.init_variables(jax.random.PRNGKey(0), hw=(256, 256))
        variables = train_briefly(seg, variables)

    # representative workload: dense nuclei through the briefly-trained net
    # (also the int8 calibration batch on the legacy path — calibrate BEFORE
    # stage 1 so the '_int8' metric suffix is truthful even with
    # BENCH_POSTPROC=0)
    uniq = np.stack([make_bench_nuclei(i)[0] for i in range(16)])
    img_r = jnp.asarray(np.tile(uniq, (max(B // 16, 1), 1, 1, 1))[:B])
    jax.block_until_ready(img_r)
    if not use_fixture and int8_mode != '0':
        seg.calibrate_int8(variables, img_r)
        if int8_mode == '1':
            seg.test_cfg['int8_eval'] = True
        else:
            int8_e2e, gate = _int8_accuracy_gate(seg, variables)
            seg.test_cfg['int8_eval'] = int8_e2e
            print(json.dumps({'int8_gate_pass': int8_e2e, **gate}),
                  file=sys.stderr, flush=True)

    # ---- RPC latency of a trivial program ---------------------------------
    @jax.jit
    def trivial(x):
        return jnp.float32(x[0, 0, 0, 0])

    float(trivial(img_r))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(img_r))
        lat.append(time.perf_counter() - t0)
    rpc_latency = sorted(lat)[len(lat) // 2]

    def _measure(chain, metric, *args):
        """Compile + 3 timed reps; every rep updates the watchdog's
        best-so-far so a deadline mid-run still emits a real number."""
        float(chain(*args))  # compile
        _stage('timed_program_compiled')
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*args))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            rate = B * ITERS / max(best - rpc_latency, 1e-9)
            _BEST.update({'metric': metric, 'value': round(rate, 1),
                          'unit': 'patches/sec/chip',
                          'vs_baseline': round(rate / BASELINE_PATCHES_PER_SEC, 3)})
        return B * ITERS / max(best - rpc_latency, 1e-9)

    def run_measurement():
        metric = (('unet_256x256_fused_e2e_throughput' if include_postproc
                   else 'unet_256x256_infer_throughput')
                  + ('_int8' if int8_e2e else '') + ('_s2d' if s2d_selected else ''))
        if include_postproc:
            # fused single-program e2e: inference + device post-proc in ONE
            # jit (the artifact users actually run). On this workload the
            # fused program reaches the two-stage composition rate (2,468 vs
            # 2,464 composed, v5e-1 B=128) — docs/ROUND3.md.
            def _fused_chain(variables, im):
                def body(i, carry):
                    out = seg.inference_and_postprocess(variables, im + carry * 1e-12)
                    return jnp.float32(jnp.max(out['inst_pred']))

                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

            rate = _measure(jit_tuned(_fused_chain, variables, img_r), metric, variables, img_r)
        else:
            # network forward + argmax only (chained, immune to pipelining)
            def _net_chain(variables, img):
                prep = seg.prepare_inference(variables)  # fold weights once

                def body(i, carry):
                    logits = seg.forward_heads(variables, img + carry * 1e-12, prep=prep)['sem']
                    return jnp.mean(jnp.argmax(logits, axis=-1).astype(jnp.float32))

                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

            rate = _measure(jit_tuned(_net_chain, variables, img_r), metric, variables, img_r)
        return metric, rate

    metric, total_rate = run_measurement()

    # ---- LIVE gate re-score (VERDICT r4 item 7), AFTER the first
    # measurement so the watchdog always holds a real number; a verdict
    # flip discards it and re-measures the fallback path.
    if live_gate is not None and int8_mode not in ('0', '1'):
        bf16_ok, int8_ok = live_gate()
        if int8_e2e != int8_ok:
            print(json.dumps({'live_gate_flip': True, 'remeasuring': 'bf16' if int8_e2e else 'int8'}),
                  file=sys.stderr, flush=True)
            _BEST.clear()
            int8_e2e = int8_ok
            seg.test_cfg['int8_eval'] = int8_e2e
            metric, total_rate = run_measurement()
        if not bf16_ok:
            # the variant's own bf16 executor regressed vs its recorded
            # fixture score: refuse to report the variant at all
            print(json.dumps({'s2d_live_anchor_failed': True, 'no_metric': True}),
                  file=sys.stderr, flush=True)
            _BEST.clear()
            sys.exit(5)

    print(json.dumps({
        'metric': metric,
        'value': round(total_rate, 1),
        'unit': 'patches/sec/chip',
        'vs_baseline': round(total_rate / BASELINE_PATCHES_PER_SEC, 3),
    }))


_FUSED_BATCH = {'HoverNet': 32}  # stride-1 trunk: huge activations; flat beyond 16


def bench_fused_model(typ: str, B: int = 0, iters: int = 8):
    """Fully-fused eval chain (inference + device post-processing in one jit
    program) for the heavier zoo members; used by BENCH_MODELS=all runs and
    docs, not the driver's single-line contract. Per-model default batches:
    64 (CDNet measured +24% over B=16), HoverNet 32 (compute-bound, flat)."""
    B = B or _FUSED_BATCH.get(typ, 64)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tiseg_tpu.models import build_segmentor

    train_imgs = 8 if typ == 'HoverNet' else 16  # stride-1 trunk: 8x activations

    test_cfg = dict(mode='whole', device_postprocess=True, radius=1)
    seg = build_segmentor(dict(type=typ, num_classes=2, train_cfg=dict(), test_cfg=test_cfg),
                          dtype=jnp.bfloat16)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(256, 256))
    variables = train_briefly(seg, variables, typ=typ, n_imgs=train_imgs)
    uniq = np.stack([make_bench_nuclei(i)[0] for i in range(16)])
    img = jnp.asarray(np.tile(uniq, (max(B // 16, 1), 1, 1, 1))[:B])
    # zoo rows stay bf16 by default (comparable across rounds); an explicit
    # BENCH_INT8_E2E=1 quantizes any model exposing calibrate_int8
    int8 = os.environ.get('BENCH_INT8_E2E', '') == '1' and hasattr(seg, 'calibrate_int8')
    if int8:
        seg.calibrate_int8(variables, jnp.asarray(uniq))
        seg.test_cfg['int8_eval'] = True

    @jax.jit
    def trivial(x):
        return jnp.float32(x[0, 0, 0, 0])

    float(trivial(img))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(img))
        lat.append(time.perf_counter() - t0)
    rpc = sorted(lat)[len(lat) // 2]

    def _chain(variables, img):
        def body(i, carry):
            out = seg.inference_and_postprocess(variables, img + carry * 1e-12)
            return jnp.float32(jnp.max(out['inst_pred']))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    chain = jit_tuned(_chain, variables, img)
    float(chain(variables, img))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(variables, img))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rate = B * iters / max(best - rpc, 1e-9)
    suffix = '_int8' if int8 else ''
    print(json.dumps({'metric': f'{typ.lower()}_256x256_fused_e2e_throughput{suffix}',
                      'value': round(rate, 1), 'unit': 'patches/sec/chip',
                      'vs_baseline': round(rate / BASELINE_PATCHES_PER_SEC, 3)}))
    return rate


def bench_whole_image(B: int = 1, iters: int = 4, hw: int = 1000):
    """The real MoNuSeg eval workload: 1000x1000 whole images through
    8-view dihedral TTA x sliding-window (256 window / 40 overlap -> 5x5
    grid = 200 network patches per image) ending in on-device instance
    maps (planes > 512^2 take the HBM-resident XLA sweep path). Reference
    hot loop: tiseg/models/segmentors/base.py:255-302 + unet.py post-proc.

    Round-3 methodology (same as the headline): briefly-trained net on
    MoNuSeg-density synthetic nuclei so the sweep post-processor sees a
    realistic plane. BENCH_INT8_E2E != '0' routes the 256^2 patch forward
    through the int8 PTQ path (the SAME patch program the headline's
    held-out accuracy gate scores)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tiseg_tpu.models import build_segmentor

    test_cfg = dict(mode='split', crop_size=(256, 256), overlap_size=(40, 40),
                    rotate_degrees=[0, 90], flip_directions=['none', 'horizontal', 'vertical', 'diagonal'],
                    device_postprocess=True, pp_sweeps=8, radius=1,
                    patch_batch=int(os.environ.get('BENCH_WHOLE_CHUNK', '100')))
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=test_cfg),
                          dtype=jnp.bfloat16)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(256, 256))
    variables = train_briefly(seg, variables)
    int8 = os.environ.get('BENCH_INT8_E2E', 'auto') != '0'
    if int8:
        calib = jnp.asarray(np.stack([make_bench_nuclei(i)[0] for i in range(16)]))
        seg.calibrate_int8(variables, calib)
        seg.test_cfg['int8_eval'] = True
    # MoNuSeg density scaled to the whole-image plane (150 per 256^2)
    n_inst = int(150 * (hw / 256.0) ** 2)
    img = jnp.asarray(np.stack([make_bench_nuclei(7000 + i, hw=hw, n_inst=n_inst)[0]
                                for i in range(B)]))

    @jax.jit
    def trivial(x):
        return jnp.float32(x[0, 0, 0, 0])

    float(trivial(img))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(img))
        lat.append(time.perf_counter() - t0)
    rpc = sorted(lat)[len(lat) // 2]

    @jax.jit
    def chain(variables, img):
        def body(i, carry):
            out = seg.inference_and_postprocess(variables, img + carry * 1e-12)
            return jnp.float32(jnp.max(out['inst_pred']))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chain(variables, img))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(variables, img))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    sec_per_img = max(best - rpc, 1e-9) / (B * iters)
    n_win = 25 * 8  # 5x5 grid x 8 TTA views
    print(json.dumps({'metric': (f'unet_{hw}x{hw}_whole_image_tta_sliding_e2e'
                                 + ('_int8' if int8 else '')),
                      'value': round(1.0 / sec_per_img, 3), 'unit': 'images/sec/chip',
                      'vs_baseline': round((1.0 / sec_per_img) * n_win / BASELINE_PATCHES_PER_SEC, 3)}))
    return 1.0 / sec_per_img


def make_universal_label_batch(B: int, hw: int, num_classes: int = 2, num_angles: int = 8, seed: int = 0):
    """Synthetic label dict carrying every key any segmentor's loss reads
    (sem/inner/with-bound semantic maps, HoverNet hv maps, DIST distance,
    CDNet direction/point, weight map) so train-throughput benches work
    across the whole zoo."""
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.default_rng(seed)
    f32 = lambda a: jnp.asarray(a.astype(np.float32))
    i32 = lambda a: jnp.asarray(a.astype(np.int32))
    return {
        'sem_gt': i32(rng.integers(0, num_classes, (B, hw, hw))),
        'sem_gt_inner': i32(rng.integers(0, num_classes, (B, hw, hw))),
        'sem_gt_w_bound': i32(rng.integers(0, num_classes + 1, (B, hw, hw))),
        'inst_gt': i32(rng.integers(0, 8, (B, hw, hw))),
        'loss_weight_map': jnp.ones((B, hw, hw), jnp.float32),
        'hv_gt': f32(rng.normal(size=(B, hw, hw, 2))),
        'dist_gt': f32(rng.random((B, hw, hw))),
        'point_gt': f32(rng.random((B, hw, hw))),
        'dir_gt': i32(rng.integers(0, num_angles + 1, (B, hw, hw))),
        'reg_dir_gt': f32(rng.random((B, hw, hw)) * 360.0),
    }


def bench_train(typ: str = 'UNet', B: int = 32, iters: int = 8, hw: int = 256):
    """Training-step throughput (forward + backward + Adam update, bf16
    compute / f32 params+optimizer, cross-replica-BN single chip).
    B=32 measured best on v5e-1 (B=64 flat); hw is parameterized so the
    CPU test can exercise this surface on tiny shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tiseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from tiseg_tpu.engine.train_state import TrainState
    from tiseg_tpu.models import build_segmentor

    if 'MicroNet' in typ:
        hw = 252  # MicroNet's fixed input contract
    seg = build_segmentor(dict(type=typ, num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')),
                          dtype=jnp.bfloat16)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(hw, hw))
    schedule = build_lr_schedule(dict(policy='fixed'), 1e-4, 1, 100)
    opt_cfg = dict(type='Adam', lr=1e-4, weight_decay=5e-4)
    if os.environ.get('BENCH_MU_DTYPE'):  # e.g. bfloat16 first moment
        opt_cfg['mu_dtype'] = os.environ['BENCH_MU_DTYPE']
    tx = build_optimizer(opt_cfg, schedule)
    state = TrainState.create(variables['params'], variables['batch_stats'], tx)

    rng = np.random.default_rng(0)
    batch = {
        'data': {'img': jnp.asarray(rng.normal(size=(B, hw, hw, 3)).astype(np.float32))},
        'label': make_universal_label_batch(B, hw),
    }
    base_key = jax.random.PRNGKey(0)

    def one_step(state):
        key = jax.random.fold_in(base_key, state.step)

        def loss_fn(params):
            vs = {'params': params, 'batch_stats': state.batch_stats}
            total, (logs, new_model_state) = seg.loss(vs, batch, train=True, rng=key)
            return total, (logs, new_model_state)

        grads, (logs, new_model_state) = jax.grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads).replace(batch_stats=new_model_state['batch_stats'])

    def _chain(state):
        return jax.lax.fori_loop(0, iters, lambda i, st: one_step(st), state)

    chain = jit_tuned(_chain, state)

    @jax.jit
    def trivial(x):
        return jnp.float32(x[0, 0, 0, 0])

    img = batch['data']['img']
    float(trivial(img))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(img))
        lat.append(time.perf_counter() - t0)
    rpc = sorted(lat)[len(lat) // 2]

    state = chain(state)  # compile + burn-in
    jax.block_until_ready(state.params)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        state = chain(state)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rate = B * iters / max(best - rpc, 1e-9)
    print(json.dumps({'metric': f'{typ.lower()}_{hw}x{hw}_train_throughput',
                      'value': round(rate, 1), 'unit': 'patches/sec/chip',
                      'vs_baseline': round(rate / BASELINE_PATCHES_PER_SEC, 3)}))
    return rate


def bench_int8(B: int = 0, iters: int = 16, hw: int = 256):
    """Int8 post-training-quantized fast path vs the shipped bf16 fast path
    (quant_decode.py): same briefly-trained UNet, same chained methodology,
    plus the argmax disagreement the 8-bit rounding costs on the
    representative workload. Gates whether the int8 path is worth wiring
    into the fused e2e program (v5e int8 MXU peak is 2x bf16)."""
    _setup_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tiseg_tpu.models import build_segmentor
    from tiseg_tpu.models.heads import quant_decode

    B = B or int(os.environ.get('BENCH_BATCH', 128))
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole')), dtype=jnp.bfloat16)
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(hw, hw))
    variables = train_briefly(seg, variables, hw=hw)
    prep = seg.prepare_inference(variables)

    uniq = np.stack([make_bench_nuclei(i, hw=hw)[0] for i in range(16)])
    img = jnp.asarray(np.tile(uniq, (max(B // 16, 1), 1, 1, 1))[:B])

    scales = jax.jit(lambda im: quant_decode.calibrate(prep['vgg'], prep['head'], im,
                                                       dtype=jnp.bfloat16))(img)
    fpq = quant_decode.quantize_params(prep['vgg'], prep['head'],
                                       jax.device_get(scales))

    @jax.jit
    def trivial(x):
        return jnp.float32(x[0, 0, 0, 0])

    float(trivial(img))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(img))
        lat.append(time.perf_counter() - t0)
    rpc = sorted(lat)[len(lat) // 2]

    def measure(fwd):
        def _chain(im):
            def body(i, carry):
                logits = fwd(im + carry * 1e-12)
                return jnp.mean(jnp.argmax(logits, axis=-1).astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        chain = jit_tuned(_chain, img)
        float(chain(img))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(img))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return B * iters / max(best - rpc, 1e-9)

    fwd_bf16 = lambda im: quant_decode.apply_fast_unet_bf16(prep['vgg'], prep['head'], im)
    fwd_int8 = lambda im: quant_decode.apply_fast_unet_q(prep['vgg'], prep['head'], fpq, im)
    fwd_q8 = lambda im: quant_decode.apply_fast_unet_q8(prep['vgg'], prep['head'], fpq, im)
    rate_bf16 = measure(fwd_bf16)
    rate_int8 = measure(fwd_int8)
    rate_q8 = measure(fwd_q8)

    a_bf16 = np.asarray(jax.jit(lambda im: jnp.argmax(fwd_bf16(im), -1))(img))
    a_int8 = np.asarray(jax.jit(lambda im: jnp.argmax(fwd_int8(im), -1))(img))
    a_q8 = np.asarray(jax.jit(lambda im: jnp.argmax(fwd_q8(im), -1))(img))
    agree = float((a_bf16 == a_int8).mean())
    agree_q8 = float((a_bf16 == a_q8).mean())

    # instance-level accuracy cost: post-process both paths' argmax planes
    # (host oracle path) and score AJI/PQ against the synthetic GT — pixel
    # agreement alone can hide instance merges/splits.
    from tiseg_tpu.models.segmentors.unet import instance_postprocess
    from tiseg_tpu.utils.metrics.inst_metrics import (pre_eval_bin_aji, pre_eval_bin_pq,
                                                      pre_eval_to_bin_aji, pre_eval_to_bin_pq)
    gts = [make_bench_nuclei(i, hw=hw)[2] for i in range(16)]
    score = {}
    for name, planes in (('bf16', a_bf16), ('int8', a_int8), ('int8_resident', a_q8)):
        ajis, pqs = [], []
        for i, gt in enumerate(gts):
            _, inst = instance_postprocess(planes[i].astype(np.uint8), radius=1)
            ajis.append(pre_eval_bin_aji(inst, gt))
            pqs.append(pre_eval_bin_pq(inst, gt))
        score[name] = {'Aji': round(float(pre_eval_to_bin_aji(ajis)['Aji']) * 100, 3),
                       'PQ': round(float(pre_eval_to_bin_pq(pqs)['PQ']) * 100, 3)}
    print(json.dumps({'metric': 'unet_int8_vs_bf16_net', 'bf16_pps': round(rate_bf16, 1),
                      'int8_pps': round(rate_int8, 1),
                      'int8_resident_pps': round(rate_q8, 1),
                      'speedup': round(rate_int8 / rate_bf16, 3),
                      'speedup_resident': round(rate_q8 / rate_bf16, 3),
                      'argmax_agreement': round(agree, 6),
                      'argmax_agreement_resident': round(agree_q8, 6), 'B': B,
                      'bf16_acc': score['bf16'], 'int8_acc': score['int8'],
                      'int8_resident_acc': score['int8_resident']}))
    return rate_int8, rate_bf16, agree


if __name__ == '__main__':
    if '--make-fixture' in sys.argv:
        require_device()
        _setup_cache()
        save_bench_fixture()
        sys.exit(0)
    _arm_watchdog()
    require_device()
    models = os.environ.get('BENCH_MODELS', '')
    if os.environ.get('BENCH_INT8', ''):
        bench_int8()
    elif os.environ.get('BENCH_WHOLE', ''):
        bench_whole_image()
    elif os.environ.get('BENCH_TRAIN', ''):
        for name in (os.environ['BENCH_TRAIN'].split(',') if os.environ['BENCH_TRAIN'] != '1'
                     else ['UNet']):
            bench_train(name)
    elif models:
        names = ['UNet', 'CDNet', 'HoverNet'] if models == 'all' else models.split(',')
        for name in names:
            bench_fused_model(name)
    else:
        main()
