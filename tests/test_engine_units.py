"""Unit tests: LR schedules, eval-hook interval logic, log buffer."""
import numpy as np
import pytest

from tiseg_tpu.engine.optim import build_lr_schedule
from tiseg_tpu.engine.runner import LogBuffer, effective_interval


def test_step_schedule_with_warmup():
    # 10 iters/epoch, decay x0.1 at epoch 200, linear warmup over 100 iters
    s = build_lr_schedule(dict(policy='step', by_epoch=True, step=[200], gamma=0.1, warmup='linear',
                               warmup_iters=100, warmup_ratio=1e-6), 1e-3, 10, 3000)
    assert float(s(0)) == pytest.approx(1e-3 * 1e-6, rel=1e-3)
    assert float(s(50)) == pytest.approx(1e-3 * (1e-6 + (1 - 1e-6) * 0.5), rel=1e-3)
    assert float(s(150)) == pytest.approx(1e-3)
    assert float(s(1999)) == pytest.approx(1e-3)
    assert float(s(2000)) == pytest.approx(1e-4)


def test_poly_schedule():
    s = build_lr_schedule(dict(policy='poly', by_epoch=False, power=1.0, min_lr=0.0, warmup=None), 1e-2, 1, 100)
    assert float(s(0)) == pytest.approx(1e-2)
    assert float(s(50)) == pytest.approx(5e-3)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-9)


def test_fixed_schedule():
    s = build_lr_schedule(dict(policy='fixed', warmup=None), 3e-4, 1, 10)
    assert float(s(7)) == pytest.approx(3e-4)


def test_effective_interval_milestones():
    ev = dict(interval=20, custom_intervals=[1], custom_milestones=[295])
    assert effective_interval(100, ev) == 20
    assert effective_interval(295, ev) == 1
    assert effective_interval(300, ev) == 1
    ev2 = dict(interval=10, custom_intervals=[5, 1], custom_milestones=[100, 200])
    assert effective_interval(50, ev2) == 10
    assert effective_interval(150, ev2) == 5
    assert effective_interval(250, ev2) == 1


def test_log_buffer_average():
    buf = LogBuffer()
    buf.update({'loss': 1.0})
    buf.update({'loss': 3.0, 'dice': 50.0})
    avg = buf.average()
    assert avg['loss'] == pytest.approx(2.0)
    assert avg['dice'] == pytest.approx(50.0)
    buf.clear()
    assert buf.vals == {}
