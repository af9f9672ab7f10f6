"""BaseSegmentor: the shared contract and inference engine.

TPU-native rebuild of tiseg/models/segmentors/base.py:50-411. A segmentor
wraps a Flax module (``self.net``) and exposes *pure functions* suitable for
jit/grad:

- ``init_variables(rng, hw)``        -> {'params', 'batch_stats'}
- ``loss(variables, batch, train)``  -> (total_loss, (log_vars, new_state))
- ``forward_heads(variables, img)``  -> {head: logits (B, H, W, K)}
- ``inference(variables, img, ori_hw)`` -> {head: TTA+split fused maps}

Training-time loss dicts follow the reference convention: every key
containing 'loss' sums into the total; other keys are logged metrics
(reference base.py:13-47 ``_parse_losses``). The eval ``postprocess`` hook
turns fused maps into {'sem_pred', 'inst_pred'} on the host; segmentors can
also provide an on-device post-processing path (tiseg_tpu.ops).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.sliding import (resize_bilinear, reverse_tta_transform, tta_forward_views,
                            tta_transform, tta_views)


def parse_losses(losses: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Sum every entry whose key contains 'loss'; return (total, log_vars).

    Under pjit-DP the logged scalars are already global means (XLA reduces
    across the mesh), which supersedes the reference's dist.all_reduce of
    log values (base.py:40-45)."""
    log_vars = dict(losses)
    total = sum(v for k, v in losses.items() if 'loss' in k)
    log_vars['loss'] = total
    return total, log_vars


class BaseSegmentor:
    """Common init/inference plumbing. Subclasses set ``self.net`` (a Flax
    module whose __call__(x, train) returns {head: logits}) and implement
    ``loss`` and ``postprocess``."""

    # softmax-fused heads under TTA; others are mean-fused raw
    softmax_heads = ('sem',)

    def __init__(self, num_classes: int, train_cfg: Optional[dict] = None, test_cfg: Optional[dict] = None):
        self.num_classes = num_classes
        self.train_cfg = dict(train_cfg or {})
        self.test_cfg = dict(test_cfg or {})
        self.net = None  # set by subclass

    # -- init ---------------------------------------------------------------
    def init_variables(self, rng, hw=(256, 256), in_channels: int = 3):
        dummy = jnp.zeros((1, hw[0], hw[1], in_channels), jnp.float32)
        # jit: flax's eager init dispatches each op individually over the
        # device link (minutes on a high-latency TPU tunnel); one compiled
        # program makes init a single round-trip.
        variables = jax.jit(partial(self.net.init, train=False))(rng, dummy)
        return variables

    # -- forward ------------------------------------------------------------
    def prepare_inference(self, variables):
        """Optional precomputation shared across eval forwards (e.g. folded
        fast-path weights). Passed back to forward_heads as ``prep``."""
        return None

    def forward_heads(self, variables, img, train: bool = False, rng=None, mutable=False, prep=None):
        """Apply the net. When training with mutable=True returns
        (heads, new_model_state)."""
        if train:
            import jax
            rngs = {'dropout': rng} if rng is not None else {'dropout': jax.random.PRNGKey(0)}
            out, new_state = self.net.apply(variables, img, train=True, rngs=rngs, mutable=['batch_stats'])
            if mutable:
                return out, new_state
            return out
        return self.net.apply(variables, img, train=False)

    def calculate(self, variables, img):
        """Semantic logits only (reference ``calculate``, base.py:58-60)."""
        return self.forward_heads(variables, img)['sem']

    # -- losses (abstract) ----------------------------------------------------
    def loss(self, variables, batch, train: bool = True, rng=None):
        raise NotImplementedError

    # -- TTA head fusion hooks ------------------------------------------------
    def reverse_head(self, name: str, logit: jnp.ndarray, rotate_degree: int, flip_direction: str) -> jnp.ndarray:
        """Undo a TTA view on one head's output. Heads whose channels encode
        directions override this (CDNet)."""
        return reverse_tta_transform(logit, rotate_degree, flip_direction)

    def fuse_head(self, name: str, logit: jnp.ndarray) -> jnp.ndarray:
        if name in self.softmax_heads:
            return jax.nn.softmax(logit, axis=-1)
        return logit

    # -- inference engine -----------------------------------------------------
    def inference(self, variables, img, ori_hw: Optional[Tuple[int, int]] = None):
        """TTA x (split | whole) -> per-head fused maps at ori_hw.

        jit-able; wrap with jax.jit at the call site (shapes static per
        image size)."""
        mode = self.test_cfg.get('mode', 'whole')
        assert mode in ('split', 'whole')
        views = tta_views(self.test_cfg)
        prep = self.prepare_inference(variables)

        def calc(patch):
            return self.forward_heads(variables, patch, train=False, prep=prep)

        ws = self.test_cfg.get('crop_size', (0,))[0]
        os_ = self.test_cfg.get('overlap_size', (0,))[0]
        outs = tta_forward_views(calc, img, views, mode, ws, os_,
                                 chunk=self.test_cfg.get('patch_batch', 8))
        accum = None
        for (rot, flip), out in zip(views, outs):
            out = {k: self.fuse_head(k, self.reverse_head(k, o, rot, flip)) for k, o in out.items()}
            accum = out if accum is None else {k: accum[k] + out[k] for k in out}
        fused = {k: v / len(views) for k, v in accum.items()}
        if ori_hw is not None:
            fused = {k: resize_bilinear(v, ori_hw) for k, v in fused.items()}
        return fused

    # -- eval post-processing (host) -------------------------------------------
    def postprocess(self, fused: Dict[str, np.ndarray]):
        """fused: per-head numpy maps for ONE image (H, W, K). Returns
        {'sem_pred': uint8 (H, W), 'inst_pred': int32 (H, W)}."""
        raise NotImplementedError

    # -- fused device path -------------------------------------------------------
    # CCL-family segmentors (per-class fill/CCL/dilate on the argmax map)
    # can run post-processing fused with inference in ONE jit program,
    # returning small integer maps instead of float logits.
    device_pp_supported = False
    device_pp_strip_boundary = False
    device_pp_default_radius = 1

    def inference_and_postprocess(self, variables, img, ori_hw=None):
        """Full eval step on device; returns {'sem_pred' (B,H,W) uint8,
        'inst_pred' (B,H,W) int32} or None if unsupported/disabled."""
        if not (self.device_pp_supported and self.test_cfg.get('device_postprocess', False)):
            return None
        fused = self.inference(variables, img, ori_hw=ori_hw)
        sem_out, inst_out = self._device_instance_pp(self._device_sem_pred(fused))
        return {'sem_pred': sem_out, 'inst_pred': inst_out}

    def _device_sem_pred(self, fused):
        """Fused maps -> the integer semantic plane the device instance
        post-processor consumes (subclasses with extra heads override)."""
        sem_pred = jnp.argmax(fused['sem'], axis=-1).astype(jnp.int32)
        if self.device_pp_strip_boundary:
            sem_pred = jnp.where(sem_pred == self.num_classes, 0, sem_pred)
        return sem_pred

    def _device_instance_pp(self, sem_pred):
        """Batched on-device fill/CCL/remove-small/dilate via the fused
        segmented-sweep kernel (tiseg_tpu.ops.pallas_sweep); planes beyond
        the VMEM working set automatically run the same algorithm as an
        HBM-resident XLA program (no size cap)."""
        from ...ops.pallas_sweep import instance_postprocess_sweep
        radius = self.test_cfg.get('radius', self.device_pp_default_radius)
        # pp_multiclass_vectorized=False opts num_classes>2 configs back
        # into the per-class loop (exact even on nested multi-class
        # enclosures — pallas_sweep._multiclass_pp_plane caveat) at
        # ~(num_classes-1)x the post-proc cost.
        return instance_postprocess_sweep(sem_pred, radius=radius, num_classes=self.num_classes,
                                          sweeps=self.test_cfg.get('pp_sweeps', 16),
                                          fill_sweeps=self.test_cfg.get('pp_fill_sweeps', 32),
                                          multiclass_vectorized=self.test_cfg.get(
                                              'pp_multiclass_vectorized', True))

    # -- training metrics --------------------------------------------------------
    def training_metrics(self, sem_logit, sem_gt) -> Dict[str, jnp.ndarray]:
        from ..losses import mdice, tdice
        return {
            'sem_tdice': tdice(sem_logit, sem_gt, self.num_classes),
            'sem_mdice': mdice(sem_logit, sem_gt, self.num_classes),
        }
