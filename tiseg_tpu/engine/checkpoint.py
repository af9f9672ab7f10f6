"""Orbax-backed checkpointing: periodic saves with max_keep, best-metric
copies, auto-resume-from-latest.

Rebuilds the reference's mmcv CheckpointHook + EvalHook ``save_best``
(checkpoint_config in configs; eval_hook.py:83-103) with async-capable
orbax; auto-resume covers the preemption-recovery gap noted in SURVEY.md §5.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


class CheckpointManager:

    def __init__(self, work_dir: str, max_keep: int = 5):
        self.dir = osp.abspath(osp.join(work_dir, 'checkpoints'))
        os.makedirs(self.dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_keep, create=True, enable_async_checkpointing=False)
        self.mgr = ocp.CheckpointManager(self.dir, options=options)
        self.best_dir = osp.join(self.dir, 'best')

    def save(self, step: int, state, metadata: Optional[Dict[str, Any]] = None):
        payload = {'params': state.params, 'batch_stats': state.batch_stats, 'opt_state': state.opt_state,
                   'step': state.step}
        args = ocp.args.Composite(state=ocp.args.StandardSave(payload))
        self.mgr.save(step, args=args)
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return state, None
        template = {'params': state.params, 'batch_stats': state.batch_stats, 'opt_state': state.opt_state,
                    'step': state.step}
        restored = self.mgr.restore(step, args=ocp.args.Composite(state=ocp.args.StandardRestore(template)))
        payload = restored['state']
        state = state.replace(params=payload['params'], batch_stats=payload['batch_stats'],
                              opt_state=payload['opt_state'], step=payload['step'])
        return state, step

    def save_best(self, state, metric_name: str, metric_value: float):
        """Keep a standalone copy of the current best variables."""
        import json
        import shutil
        ckptr = ocp.StandardCheckpointer()
        payload = {'params': state.params, 'batch_stats': state.batch_stats}
        tmp = osp.join(self.dir, 'best_tmp')
        if osp.exists(tmp):
            shutil.rmtree(tmp)
        ckptr.save(tmp, payload, force=True)
        ckptr.wait_until_finished()
        if osp.exists(self.best_dir):
            shutil.rmtree(self.best_dir)
        os.replace(tmp, self.best_dir)
        with open(osp.join(self.dir, 'best_meta.json'), 'w') as f:
            json.dump({'metric': metric_name, 'value': float(metric_value), 'step': int(state.step)}, f)

    def load_variables(self, path: Optional[str] = None, template=None):
        """Load {'params', 'batch_stats'} for evaluation from a checkpoint
        directory (a manager step dir, or the 'best' dir)."""
        path = path or self.best_dir
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path) if template is None else ckptr.restore(path, target=template)
        return restored
