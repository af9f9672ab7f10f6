"""Logging utilities: named logger with file + stream handlers and a JSONL
structured log writer.

Rebuilds the observability surface of the reference (reference:
tools/train.py:93 ``get_logger``; mmcv TextLoggerHook ``.log.json`` records
consumed by tools/log_analysis.py:9-60).
"""
from __future__ import annotations

import json
import logging
import os
import os.path as osp
import sys
from typing import Any, Dict, Optional

_LOGGERS = {}


def get_logger(name: str = 'TisegTPU', log_file: Optional[str] = None, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if name in _LOGGERS:
        return logger
    logger.setLevel(level)
    logger.propagate = False
    fmt = logging.Formatter('%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        os.makedirs(osp.dirname(osp.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = True
    return logger


class JsonlLogger:
    """Append-only structured log, one JSON object per line.

    The TPU-native equivalent of mmcv's ``.log.json`` (parsed by the
    reference's tools/log_analysis.py and TrainingCurveHook).
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)

    def log(self, record: Dict[str, Any]):
        def _py(v):
            if hasattr(v, 'item'):
                try:
                    return v.item()
                except Exception:
                    return str(v)
            if isinstance(v, dict):
                return {k: _py(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [_py(x) for x in v]
            return v

        with open(self.path, 'a') as f:
            f.write(json.dumps({k: _py(v) for k, v in record.items()}) + '\n')

    def read(self):
        records = []
        if not osp.exists(self.path):
            return records
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    records.append(json.loads(line))
        return records
