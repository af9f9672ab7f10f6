"""Every shipped config must parse and build its segmentor."""
import os
import os.path as osp

import jax
import pytest

from tiseg_tpu.models import build_segmentor
from tiseg_tpu.utils import Config

CONFIG_ROOT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), 'configs')


def all_model_configs():
    out = []
    for dirpath, _, files in os.walk(CONFIG_ROOT):
        if '_base_' in dirpath:
            continue
        for f in files:
            # top-level model configs reference _base_; data-only configs
            # (monuseg.py / conic.py) are bases
            if f.endswith('.py') and f not in ('monuseg.py', 'conic.py'):
                out.append(osp.join(dirpath, f))
    return sorted(out)


@pytest.mark.parametrize('path', all_model_configs(), ids=lambda p: osp.basename(p))
def test_config_parses_and_builds(path):
    cfg = Config.fromfile(path)
    assert 'model' in cfg and 'data' in cfg and 'optimizer' in cfg
    assert cfg.model['type']
    seg = build_segmentor(cfg.model)
    assert seg.num_classes == cfg.model['num_classes']
    # pipeline classes must all resolve
    from tiseg_tpu.datasets.ops import class_dict
    for proc in cfg.data['train']['processes']:
        assert proc['type'] in class_dict, proc['type']
