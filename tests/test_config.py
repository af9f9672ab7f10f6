import os

from tiseg_tpu.utils import Config, Registry, parse_option_value


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        f.write(text)


def test_base_inheritance(tmp_path):
    _write(str(tmp_path / 'base.py'), "a = 1\nmodel = dict(type='UNet', num_classes=2, train_cfg=dict(x=1))\n")
    _write(
        str(tmp_path / 'child.py'), "_base_ = ['./base.py']\n"
        "model = dict(num_classes=3, train_cfg=dict(y=2))\n"
        "b = 'hello'\n")
    cfg = Config.fromfile(str(tmp_path / 'child.py'))
    assert cfg.a == 1
    assert cfg.b == 'hello'
    assert cfg.model.type == 'UNet'
    assert cfg.model.num_classes == 3
    assert cfg.model.train_cfg.x == 1
    assert cfg.model.train_cfg.y == 2


def test_delete_key(tmp_path):
    _write(str(tmp_path / 'base.py'), "opt = dict(type='Adam', lr=1e-4)\n")
    _write(str(tmp_path / 'child.py'), "_base_ = ['./base.py']\nopt = dict(_delete_=True, type='SGD')\n")
    cfg = Config.fromfile(str(tmp_path / 'child.py'))
    assert cfg.opt == {'type': 'SGD'}


def test_options_override(tmp_path):
    _write(str(tmp_path / 'c.py'), "model = dict(test_cfg=dict(mode='whole'))\n")
    cfg = Config.fromfile(str(tmp_path / 'c.py'))
    cfg.merge_from_options({'model.test_cfg.mode': 'split', 'data.samples_per_gpu': 8})
    assert cfg.model.test_cfg.mode == 'split'
    assert cfg.data.samples_per_gpu == 8


def test_dump_roundtrip(tmp_path):
    _write(str(tmp_path / 'c.py'), "x = dict(a=[1, 2], b=(3, 4))\ns = 'str'\n")
    cfg = Config.fromfile(str(tmp_path / 'c.py'))
    out = str(tmp_path / 'dump.py')
    cfg.dump(out)
    cfg2 = Config.fromfile(out)
    assert cfg2.x['a'] == [1, 2]
    assert cfg2.s == 'str'


def test_parse_option_value():
    assert parse_option_value('1') == 1
    assert parse_option_value('1.5') == 1.5
    assert parse_option_value('true') is True
    assert parse_option_value('[1,2]') == [1, 2]
    assert parse_option_value('hello') == 'hello'


def test_registry():
    R = Registry('things')

    @R.register_module()
    class Foo:

        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = R.build(dict(type='Foo', a=1))
    assert obj.a == 1 and obj.b == 2
    assert 'Foo' in R
