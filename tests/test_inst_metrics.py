"""Golden tests for AJI/PQ: the fast contingency-table implementations must
match a brute-force per-mask oracle implementing the published definitions
(AJI from Kumar et al., PQ from Kirillov et al., with the reference's union
bookkeeping: argmax-per-GT pairing with pred reuse, unpaired GT and pred
areas added to union)."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from tiseg_tpu.utils.metrics import (binary_aggregated_jaccard_index, binary_inst_dice, binary_panoptic_quality,
                                     pre_eval_bin_aji, pre_eval_bin_pq, pre_eval_to_bin_pq, pre_eval_to_imw_pq)
from tiseg_tpu.utils.morphology import label as cc_label


def random_blobs(rng, shape=(96, 96), n=12, rmax=9):
    """Random disk instances; later disks overwrite earlier ones."""
    inst = np.zeros(shape, dtype=np.int32)
    H, W = shape
    for i in range(1, n + 1):
        cy, cx = rng.integers(0, H), rng.integers(0, W)
        r = rng.integers(2, rmax)
        yy, xx = np.ogrid[:H, :W]
        inst[(yy - cy)**2 + (xx - cx)**2 <= r**2] = i
    return inst


def oracle_bin_aji(inst_pred, inst_gt):
    inst_pred = cc_label(inst_pred)
    inst_gt = cc_label(inst_gt)
    gt_ids = [int(i) for i in np.unique(inst_gt) if i != 0]
    pred_ids = [int(i) for i in np.unique(inst_pred) if i != 0]
    if len(gt_ids) == 0 or len(pred_ids) == 0:
        return 0., 0.
    inter = np.zeros((len(gt_ids), len(pred_ids)))
    union = np.zeros((len(gt_ids), len(pred_ids)))
    for gi, g in enumerate(gt_ids):
        gm = inst_gt == g
        for pi, p in enumerate(pred_ids):
            pm = inst_pred == p
            i = np.sum(gm & pm)
            if i > 0:
                inter[gi, pi] = i
                union[gi, pi] = np.sum(gm | pm)
    iou = inter / (union + 1e-6)
    best = np.argmax(iou, axis=1)
    has_pair = np.max(iou, axis=1) > 0
    oi = ou = 0.0
    used_pred = set()
    for gi, g in enumerate(gt_ids):
        if has_pair[gi]:
            oi += inter[gi, best[gi]]
            ou += union[gi, best[gi]]
            used_pred.add(best[gi])
        else:
            ou += np.sum(inst_gt == g)
    for pi, p in enumerate(pred_ids):
        if pi not in used_pred:
            ou += np.sum(inst_pred == p)
    return float(oi), float(ou)


def oracle_bin_pq(inst_pred, inst_gt, match_iou=0.5):
    inst_pred = cc_label(inst_pred)
    inst_gt = cc_label(inst_gt)
    gt_ids = [int(i) for i in np.unique(inst_gt) if i != 0]
    pred_ids = [int(i) for i in np.unique(inst_pred) if i != 0]
    iou = np.zeros((len(gt_ids), len(pred_ids)))
    for gi, g in enumerate(gt_ids):
        gm = inst_gt == g
        for pi, p in enumerate(pred_ids):
            pm = inst_pred == p
            i = np.sum(gm & pm)
            if i > 0:
                iou[gi, pi] = i / np.sum(gm | pm)
    if match_iou >= 0.5:
        pairs = np.argwhere(iou > match_iou)
    else:
        if iou.size:
            pg, pp = linear_sum_assignment(-iou)
            pairs = np.array([(g, p) for g, p in zip(pg, pp) if iou[g, p] > match_iou]).reshape(-1, 2)
        else:
            pairs = np.zeros((0, 2), dtype=int)
    tp = len(pairs)
    fp = len(pred_ids) - len(set(pairs[:, 1].tolist())) if tp else len(pred_ids)
    fn = len(gt_ids) - len(set(pairs[:, 0].tolist())) if tp else len(gt_ids)
    s = float(sum(iou[g, p] for g, p in pairs))
    return tp, fp, fn, s


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_bin_aji_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    gt = random_blobs(rng)
    pred = random_blobs(rng)
    got = pre_eval_bin_aji(pred, gt)
    want = oracle_bin_aji(pred, gt)
    assert got == pytest.approx(want)


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_bin_pq_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    gt = random_blobs(rng)
    pred = random_blobs(rng)
    got = pre_eval_bin_pq(pred, gt)
    want = oracle_bin_pq(pred, gt)
    assert got[:3] == want[:3]
    assert got[3] == pytest.approx(want[3])


def test_perfect_prediction():
    rng = np.random.default_rng(42)
    gt = random_blobs(rng)
    i, u = pre_eval_bin_aji(gt.copy(), gt)
    assert i == u and i > 0
    assert binary_aggregated_jaccard_index(gt.copy(), gt) == 1.0
    dq, sq, pq = binary_panoptic_quality(gt.copy(), gt)
    assert dq == pytest.approx(1.0)
    assert sq == pytest.approx(1.0, abs=1e-5)
    assert binary_inst_dice(gt.copy(), gt) == pytest.approx(1.0)


def test_empty_cases():
    z = np.zeros((32, 32), dtype=np.int32)
    gt = np.zeros((32, 32), dtype=np.int32)
    gt[4:10, 4:10] = 1
    assert pre_eval_bin_aji(z, gt) == (0., 0.)
    tp, fp, fn, iou = pre_eval_bin_pq(z, gt)
    assert (tp, fp, fn, iou) == (0, 0, 1, 0.0)
    tp, fp, fn, iou = pre_eval_bin_pq(gt, z)
    assert (tp, fp, fn, iou) == (0, 1, 0, 0.0)


def test_all_empty_prediction_reducers_do_not_crash():
    """An untrained model predicting zero instances on every image must
    yield nan (sanitizable via nan_to_num), not ZeroDivisionError —
    pre_eval_bin_aji early-exits to (0, 0) rows in that case."""
    from tiseg_tpu.utils.metrics.inst_metrics import (pre_eval_to_aji, pre_eval_to_bin_aji,
                                                      pre_eval_to_inst_dice)
    rows = [(0., 0.), (0., 0.)]
    with np.errstate(invalid='ignore', divide='ignore'):
        assert np.isnan(pre_eval_to_aji(rows)['Aji'])
        assert np.isnan(pre_eval_to_bin_aji(rows)['Aji'])
        assert pre_eval_to_aji(rows, nan_to_num=0.0)['Aji'] == 0.0
        dice = pre_eval_to_inst_dice([(0., 0., 0., 0.)] * 2, nan_to_num=0.0)
    assert dice['InstDice'] == 0.0


def test_pq_reducers():
    rng = np.random.default_rng(7)
    pre = []
    for _ in range(3):
        gt = random_blobs(rng)
        pred = random_blobs(rng)
        pre.append(pre_eval_bin_pq(pred, gt))
    pooled = pre_eval_to_bin_pq(pre)
    assert 0 <= pooled['PQ'] <= 1
    imw = pre_eval_to_imw_pq(pre)
    assert imw['PQ'].shape == (3,)
