"""Optimizers and LR schedules from config.

Rebuild of the reference's mmcv optimizer/lr hooks (configs use
``optimizer = dict(type='Adam', lr=..., weight_decay=...)`` and
``lr_config = dict(policy='step'|'poly'|'fixed', warmup='linear', ...)``;
reference tiseg/apis/train.py:100-110 + tiseg/utils/radam.py).

Weight decay follows torch-Adam semantics (L2 term added to the gradient
*before* the moment updates), so training curves are comparable.
"""
from __future__ import annotations

from typing import Callable, Optional

import optax


def build_lr_schedule(lr_config: dict, base_lr: float, iters_per_epoch: int, total_iters: int) -> Callable:
    """Map mmcv-style lr_config to an optax schedule over *iterations*."""
    lr_config = dict(lr_config or {})
    policy = lr_config.get('policy', 'fixed')
    by_epoch = lr_config.get('by_epoch', True)
    warmup = lr_config.get('warmup', None)
    warmup_iters = lr_config.get('warmup_iters', 0)
    warmup_ratio = lr_config.get('warmup_ratio', 0.1)

    import jax.numpy as jnp

    def base_schedule(it):
        # traced-value safe: pure jnp arithmetic, no python branching on `it`
        if policy == 'fixed':
            return jnp.asarray(base_lr, jnp.float32)
        if policy == 'step':
            steps = lr_config.get('step', [])
            if isinstance(steps, int):
                steps = [steps]
            gamma = lr_config.get('gamma', 0.1)
            progress = it / iters_per_epoch if by_epoch else it
            n_decays = sum((jnp.asarray(progress) >= s).astype(jnp.float32) for s in steps)
            return base_lr * gamma**n_decays
        if policy == 'poly':
            power = lr_config.get('power', 1.0)
            min_lr = lr_config.get('min_lr', 0.0)
            frac = jnp.clip(it / max(total_iters, 1), 0.0, 1.0)
            return (base_lr - min_lr) * (1 - frac)**power + min_lr
        raise ValueError(f'unknown lr policy {policy}')

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        lr = base_schedule(it)
        if warmup == 'linear' and warmup_iters > 0:
            k = jnp.clip(it / warmup_iters, 0.0, 1.0)
            warm = lr * (warmup_ratio + (1 - warmup_ratio) * k)
            return jnp.where(it < warmup_iters, warm, lr)
        return lr

    return schedule


def build_optimizer(optimizer_cfg: dict, lr_schedule: Callable,
                    grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop('type', 'Adam')
    cfg.pop('lr', None)
    weight_decay = cfg.pop('weight_decay', 0.0)

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        # torch-style L2: decay enters the gradient before moment estimation
        chain.append(optax.add_decayed_weights(weight_decay))

    # optional first-moment dtype (e.g. 'bfloat16' halves Adam's mu state
    # memory; second moment stays f32 for rsqrt precision)
    mu_dtype = cfg.pop('mu_dtype', None)
    if opt_type in ('Adam', 'adam'):
        chain.append(optax.scale_by_adam(b1=cfg.pop('betas', (0.9, 0.999))[0] if 'betas' in cfg else 0.9,
                                         b2=0.999, eps=cfg.pop('eps', 1e-8), mu_dtype=mu_dtype))
    elif opt_type in ('AdamW', 'adamw'):
        chain.append(optax.scale_by_adam(mu_dtype=mu_dtype))
    elif opt_type in ('RAdam', 'radam'):
        chain.append(optax.scale_by_radam())
    elif opt_type in ('SGD', 'sgd'):
        momentum = cfg.pop('momentum', 0.0)
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=cfg.pop('nesterov', False)))
    else:
        raise KeyError(f'unknown optimizer {opt_type}')

    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)
