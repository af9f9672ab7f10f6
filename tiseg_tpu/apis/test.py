"""Evaluation loops (reference: tiseg/apis/test.py:7-105).

``single_device_test``: batch-1 loop — jitted TTA+sliding-window inference
on device, instance post-processing + metric pre-eval on host. Inference
functions are cached per original image size so each distinct shape
compiles once.

``multi_process_test``: each JAX process evaluates a disjoint shard of the
dataset (DistributedSampler analog); per-image pre-eval packages are
python objects, merged by the caller (single-host: trivially; multi-host:
via jax.experimental.multihost_utils broadcast of pickled shards).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import numpy as np

from ..utils import get_logger


class InferenceRunner:
    """Caches a jitted inference closure per (H, W, ori_hw). When the
    segmentor supports the fused device path (inference + instance
    post-processing in one jit, returning small integer maps instead of
    float logits), that program is used instead."""

    def __init__(self, segmentor, variables):
        self.segmentor = segmentor
        self.variables = variables
        self.fused_device = (getattr(segmentor, 'device_pp_supported', False)
                             and segmentor.test_cfg.get('device_postprocess', False))
        self._cache = {}

    def dispatch(self, img: np.ndarray, ori_hw):
        """Enqueue the device program and return its (async) jax arrays —
        the caller can keep doing host work while the device computes."""
        key = (img.shape, tuple(ori_hw))
        if key not in self._cache:
            seg = self.segmentor
            if self.fused_device:
                self._cache[key] = jax.jit(
                    lambda v, im: seg.inference_and_postprocess(v, im, ori_hw=tuple(ori_hw)))
            else:
                self._cache[key] = jax.jit(lambda v, im: seg.inference(v, im, ori_hw=tuple(ori_hw)))
        return self._cache[key](self.variables, img)

    def __call__(self, img: np.ndarray, ori_hw):
        return {k: np.asarray(v) for k, v in self.dispatch(img, ori_hw).items()}


def single_device_test(segmentor, variables, dataset, pre_eval: bool = True, show: bool = False,
                       show_folder: Optional[str] = None, indices: Optional[List[int]] = None,
                       progress: bool = True) -> List:
    logger = get_logger()
    runner = InferenceRunner(segmentor, variables)
    indices = list(range(len(dataset))) if indices is None else list(indices)
    results = []

    def consume(i, fused_dev):
        fused = {k: np.asarray(v) for k, v in fused_dev.items()}
        if runner.fused_device:
            pred = {k: v[0] for k, v in fused.items()}  # already post-processed
        else:
            pred = segmentor.postprocess({k: v[0] for k, v in fused.items()})
        if pre_eval:
            # device_metrics: AJI/PQ/confusion also on device (one jit per
            # image), host numpy kept as the oracle path
            if (segmentor.test_cfg.get('device_metrics', False) and not show
                    and hasattr(dataset, 'pre_eval_device')):
                results.extend(dataset.pre_eval_device(pred, i))
            else:
                results.extend(dataset.pre_eval(pred, i, show=show, show_folder=show_folder))
        else:
            results.append(pred)

    # one-item software pipeline: dispatch image n+1's device program
    # (async) BEFORE doing image n's host work (post-proc / pre-eval /
    # next-item loading), so the device computes while the host consumes.
    # Results are consumed strictly in order — identical to the serial loop.
    pending = None
    for n, i in enumerate(indices):
        item = dataset[i]
        img = item['data']['img'][None]
        ori_hw = tuple(item['metas']['ori_hw'])
        fused_dev = runner.dispatch(img, ori_hw)
        if pending is not None:
            consume(*pending)
        pending = (i, fused_dev)
        if progress and (n + 1) % 5 == 0:
            logger.info(f'eval [{n + 1}/{len(indices)}]')
    if pending is not None:
        consume(*pending)
    return results


def multi_process_test(segmentor, variables, dataset, pre_eval: bool = True, show: bool = False,
                       show_folder: Optional[str] = None) -> List:
    """Shard eval across JAX processes (reference multi_gpu_test,
    apis/test.py:47-105). Returns this process's results; on multi-host the
    caller merges via gather_object_shards."""
    world = jax.process_count()
    rank = jax.process_index()
    indices = list(range(len(dataset)))[rank::world]
    return single_device_test(segmentor, variables, dataset, pre_eval, show, show_folder, indices=indices)


def gather_object_shards(shard: List) -> List:
    """All-gather python objects across processes (single-process: identity).
    TPU-native replacement of the reference's collect_results_cpu."""
    if jax.process_count() == 1:
        return shard
    import pickle
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(shard), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.array([payload.size]))
    maxlen = int(np.max(sizes))
    padded = np.zeros(maxlen, np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for row, size in zip(gathered, sizes.ravel()):
        out.extend(pickle.loads(row[:int(size)].tobytes()))
    return out
