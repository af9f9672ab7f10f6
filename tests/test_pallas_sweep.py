"""Segmented-sweep post-processing kernels vs the exact host oracle.

Covers VERDICT round-1 weak #8: serpentine/spiral worst cases — sweep
convergence is measured in geodesic *bends*, not pixels, so these tests
pin the exactness contract explicitly.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tiseg_tpu.models.segmentors.unet import instance_postprocess
from tiseg_tpu.ops.pallas_sweep import ccl_sweep, fill_holes_sweep, instance_postprocess_sweep
from tiseg_tpu.utils import morphology as m

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


def blobs(seed, hw=96, n=25, rmax=7):
    rng = np.random.default_rng(seed)
    sem = np.zeros((hw, hw), np.int32)
    yy, xx = np.ogrid[:hw, :hw]
    for _ in range(n):
        cy, cx = rng.integers(0, hw, 2)
        r = rng.integers(2, rmax)
        sem[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1
    return sem


def partition_bijective(a, b):
    pairs = set(zip(a.ravel().tolist(), b.ravel().tolist()))
    amap, bmap = {}, {}
    for x, y in pairs:
        amap.setdefault(x, set()).add(y)
        bmap.setdefault(y, set()).add(x)
    return all(len(v) == 1 for v in amap.values()) and all(len(v) == 1 for v in bmap.values())


@pytest.mark.parametrize('seed', [0, 3])
def test_instance_postprocess_sweep_matches_host(seed):
    sem = blobs(seed)
    host_sem, host_inst = instance_postprocess(sem.astype(np.uint8), radius=1)
    got_sem, got_inst = instance_postprocess_sweep(jnp.asarray(sem), radius=1, num_classes=2, sweeps=8)
    got_sem, got_inst = np.asarray(got_sem), np.asarray(got_inst)
    np.testing.assert_array_equal(got_sem, host_sem)
    assert partition_bijective(host_inst, got_inst)


def test_instance_postprocess_sweep_batched():
    sems = np.stack([blobs(0), blobs(1)])
    got_sem, got_inst = instance_postprocess_sweep(jnp.asarray(sems), radius=1, num_classes=2, sweeps=8)
    for i in range(2):
        host_sem, host_inst = instance_postprocess(sems[i].astype(np.uint8), radius=1)
        np.testing.assert_array_equal(np.asarray(got_sem[i]), host_sem)
        assert partition_bijective(host_inst, np.asarray(got_inst[i]))


def multiclass_blobs(seed, hw=96, n=30, rmax=7, num_classes=7):
    rng = np.random.default_rng(seed)
    sem = np.zeros((hw, hw), np.int32)
    yy, xx = np.ogrid[:hw, :hw]
    for _ in range(n):
        cy, cx = rng.integers(0, hw, 2)
        r = rng.integers(2, rmax)
        sem[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = rng.integers(1, num_classes)
    return sem


@pytest.mark.parametrize('seed', [0, 2])
def test_multiclass_vectorized_matches_host_and_perclass(seed):
    """The single-pass class-vectorized pipeline must reproduce both the
    host oracle and the per-class device loop on 7-class maps (incl.
    touching different-class blobs and ring-shaped holes)."""
    sem = multiclass_blobs(seed)
    # add a ring with a hole (fill path) touching another class
    yy, xx = np.ogrid[:96, :96]
    d2 = (yy - 48) ** 2 + (xx - 48) ** 2
    sem[(d2 <= 144) & (d2 >= 49)] = 3
    host_sem, host_inst = instance_postprocess(sem.astype(np.uint8), radius=1)
    vec_sem, vec_inst = instance_postprocess_sweep(jnp.asarray(sem), radius=1, num_classes=7,
                                                   sweeps=16, fill_sweeps=8)
    loop_sem, loop_inst = instance_postprocess_sweep(jnp.asarray(sem), radius=1, num_classes=7,
                                                     sweeps=16, fill_sweeps=8,
                                                     multiclass_vectorized=False)
    np.testing.assert_array_equal(np.asarray(vec_sem), host_sem)
    np.testing.assert_array_equal(np.asarray(vec_sem), np.asarray(loop_sem))
    assert partition_bijective(host_inst, np.asarray(vec_inst))
    assert partition_bijective(np.asarray(loop_inst), np.asarray(vec_inst))


def test_instance_postprocess_sweep_small_plane_large_min_size():
    """Planes with min(H, W) < 3*min_size - 2 take the masked-roll size
    filter (exact at any size; the unmasked wraparound argument doesn't
    apply)."""
    sem = blobs(5, hw=32, n=6, rmax=9)
    host_sem, host_inst = instance_postprocess(sem.astype(np.uint8), radius=1, min_size=20)
    got_sem, got_inst = instance_postprocess_sweep(jnp.asarray(sem), radius=1, num_classes=2,
                                                   sweeps=16, min_size=20)
    np.testing.assert_array_equal(np.asarray(got_sem), host_sem)
    assert partition_bijective(host_inst, np.asarray(got_inst))


def test_mt_instance_postprocess_sweep_matches_host():
    """Seed+canvas multi-task recovery vs the host numpy pipeline
    (remove-small -> fill -> seed CCL -> align_foreground max-id waves)."""
    from tiseg_tpu.models.segmentors.multi_task_unet import align_foreground
    from tiseg_tpu.ops.pallas_sweep import mt_instance_postprocess_sweep

    sem = blobs(7, hw=96, n=20, rmax=8)
    rng = np.random.default_rng(7)
    seed = sem.copy()
    from scipy import ndimage
    seed[ndimage.binary_erosion(sem > 0, iterations=2) == 0] = 0  # inner seeds
    seed[rng.random(sem.shape) < 0.02] = 0

    canvas = np.zeros_like(sem, np.uint8)
    mask = m.remove_small_objects(sem == 1, 5)
    mask = m.binary_fill_holes(mask)
    canvas[mask] = 1
    host_inst = m.label(seed, connectivity=1)
    host_inst = align_foreground(host_inst, canvas > 0, 20)

    got_sem, got_inst = mt_instance_postprocess_sweep(jnp.asarray(sem), jnp.asarray(seed),
                                                      num_classes=2, sweeps=16, fill_sweeps=8)
    np.testing.assert_array_equal(np.asarray(got_sem), canvas)
    assert partition_bijective(host_inst, np.asarray(got_inst))


def serpentine(hw=128, pitch=8):
    """One long snake: ~hw/pitch bends."""
    s = np.zeros((hw, hw), bool)
    for k, i in enumerate(range(0, hw - pitch, pitch)):
        s[i, 4:hw - 4] = True
        if k % 2 == 0:
            s[i:i + pitch + 1, hw - 5] = True
        else:
            s[i:i + pitch + 1, 4] = True
    return s


def spiral(hw=128, gap=6):
    s = np.zeros((hw, hw), bool)
    lo, hi = 2, hw - 3
    while lo < hi:
        s[lo, lo:hi + 1] = True
        s[lo:hi + 1, hi] = True
        s[hi, lo:hi + 1] = True
        s[lo + gap:hi + 1, lo] = True
        lo += gap
        hi -= gap
    return s


def test_ccl_sweep_serpentine_exact_with_enough_sweeps():
    s = serpentine()
    n_bends = 2 * (128 // 8)
    lab = np.asarray(ccl_sweep(jnp.asarray(s), connectivity=2, sweeps=n_bends))
    ref = m.label(s, connectivity=2)
    assert len(np.unique(lab)) - 1 == len(np.unique(ref)) - 1 == 1
    # under-budgeted sweeps split the snake — documents the exactness knob
    lab4 = np.asarray(ccl_sweep(jnp.asarray(s), connectivity=2, sweeps=4))
    assert len(np.unique(lab4)) - 1 > 1


def test_ccl_sweep_spiral_exact():
    s = spiral()
    # spiral turn count: ~4 per ring
    lab = np.asarray(ccl_sweep(jnp.asarray(s), connectivity=2, sweeps=48))
    ref = m.label(s, connectivity=2)
    assert len(np.unique(lab)) - 1 == len(np.unique(ref)) - 1


def test_ccl_sweep_4conn_vs_8conn():
    # two diagonal-touching pixels: one 8-conn component, two 4-conn
    s = np.zeros((16, 16), bool)
    s[4, 4] = s[5, 5] = True
    lab8 = np.asarray(ccl_sweep(jnp.asarray(s), connectivity=2, sweeps=2))
    lab4 = np.asarray(ccl_sweep(jnp.asarray(s), connectivity=1, sweeps=2))
    assert len(np.unique(lab8)) - 1 == 1
    assert len(np.unique(lab4)) - 1 == 2


def test_fill_holes_sweep_matches_host():
    mask = np.zeros((64, 64), bool)
    mask[8:40, 8:40] = True
    mask[16:24, 16:24] = False         # hole
    mask[50:60, 50:60] = True
    mask[54:56, 0:20] = True           # bay open to the border (not a hole)
    mask[55, 10] = False
    got = np.asarray(fill_holes_sweep(jnp.asarray(mask), sweeps=4))
    want = m.binary_fill_holes(mask)
    np.testing.assert_array_equal(got, want)


def test_fill_holes_tortuous_channel_exact_at_default():
    """Regression (round 3): a serpentine background corridor reaching the
    border through many bends must NOT be filled. The old fill cap of 4
    mis-filled its tail (first seen as a 2-px e2e divergence on a trained
    net's MoNuSeg-density prediction); the fixpoint early-exit makes the
    raised default cap free on ordinary planes."""
    mask = np.zeros((64, 64), bool)
    mask[4:60, 4:60] = True
    rows = list(range(6, 32, 4))
    mask[rows[0], 4:56] = False           # entry channel, open at the left edge
    for r in rows[1:]:
        mask[r, 8:56] = False             # closed-ended inner channels
    for k in range(len(rows) - 1):        # alternating joints chain them
        col = 55 if k % 2 == 0 else 8
        mask[rows[k]:rows[k + 1] + 1, col] = False
    mask[40:46, 40:46] = False            # a genuine hole: must still be filled
    want = m.binary_fill_holes(mask)
    got = np.asarray(fill_holes_sweep(jnp.asarray(mask))) > 0
    np.testing.assert_array_equal(got, want)
    # the corridor really needs the depth: a 2-sweep cap mis-fills it
    shallow = np.asarray(fill_holes_sweep(jnp.asarray(mask), sweeps=2)) > 0
    assert (shallow != want).any()
    # and the full pipeline at shipped defaults matches the host oracle
    host_sem, host_inst = instance_postprocess(mask.astype(np.uint8), radius=1)
    got_sem, got_inst = instance_postprocess_sweep(jnp.asarray(mask.astype(np.int32)), radius=1)
    np.testing.assert_array_equal(np.asarray(got_sem), host_sem)
    assert partition_bijective(host_inst, np.asarray(got_inst))


def test_sweep_multiclass():
    sem = blobs(0)
    sem[blobs(7) > 0] = 2
    got_sem, got_inst = instance_postprocess_sweep(jnp.asarray(sem), radius=1, num_classes=3, sweeps=8)
    host_sem, host_inst = instance_postprocess(sem.astype(np.uint8), radius=1)
    np.testing.assert_array_equal(np.asarray(got_sem), host_sem)
    assert partition_bijective(host_inst, np.asarray(got_inst))


def test_sweep_large_plane_xla_path():
    """Planes beyond the VMEM working set route to the HBM-resident XLA
    program (same algorithm, no 512^2 cap) — whole-image MoNuSeg eval."""
    from tiseg_tpu.ops.pallas_sweep import MAX_VMEM_PLANE_SWEEP
    hw = 600
    assert hw * hw > MAX_VMEM_PLANE_SWEEP
    sem = blobs(2, hw=hw, n=120)
    got_sem, got_inst = instance_postprocess_sweep(jnp.asarray(sem), radius=1, num_classes=2, sweeps=8)
    host_sem, host_inst = instance_postprocess(sem.astype(np.uint8), radius=1)
    np.testing.assert_array_equal(np.asarray(got_sem), host_sem)
    assert partition_bijective(host_inst, np.asarray(got_inst))
