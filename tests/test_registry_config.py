import os.path as osp

import pytest

from deep3dmap_tpu.utils import Config, Registry, build_from_cfg
from deep3dmap_tpu.utils.config import DictAction


def test_registry_basic():
    REG = Registry("thing")

    @REG.register_module()
    class Foo:
        def __init__(self, a=1):
            self.a = a

    assert "Foo" in REG
    obj = REG.build(dict(type="Foo", a=3))
    assert isinstance(obj, Foo) and obj.a == 3

    obj2 = build_from_cfg(dict(type="Foo"), REG, default_args=dict(a=7))
    assert obj2.a == 7

    with pytest.raises(KeyError):
        REG.build(dict(type="Bar"))


def test_registry_duplicate_and_parent():
    parent = Registry("parent")
    child = Registry("child", parent=parent)

    @child.register_module()
    class A:
        pass

    assert parent.get("A") is A  # lookup descends into children
    with pytest.raises(KeyError):
        child.register_module(module=A)  # duplicate


def test_config_fromfile_and_base(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("a = 1\nmodel = dict(type='M', depth=50, nested=dict(x=1))\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = './base.py'\nb = 2\nmodel = dict(depth=101)\n")

    cfg = Config.fromfile(str(child))
    assert cfg.a == 1 and cfg.b == 2
    assert cfg.model.type == "M"
    assert cfg.model.depth == 101  # child overrides
    assert cfg.model.nested.x == 1  # base preserved


def test_config_delete_key(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("model = dict(type='M', depth=50)\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = './base.py'\nmodel = dict(_delete_=True, type='N')\n")
    cfg = Config.fromfile(str(child))
    assert cfg.model == dict(type="N")


def test_config_merge_from_dict():
    cfg = Config(dict(model=dict(depth=50), lr=0.1))
    cfg.merge_from_dict({"model.depth": 101, "lr": 0.2, "new.key": 5})
    assert cfg.model.depth == 101
    assert cfg.lr == 0.2
    assert cfg.new.key == 5


def test_config_dump_roundtrip(tmp_path):
    cfg = Config(dict(a=1, model=dict(type="M", lw=[1.0, 0.8])))
    out = tmp_path / "dump.py"
    cfg.dump(str(out))
    cfg2 = Config.fromfile(str(out))
    assert cfg2.a == 1 and cfg2.model.lw == [1.0, 0.8]


def test_dict_action():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg-options", nargs="+", action=DictAction)
    args = parser.parse_args(["--cfg-options", "model.lr=0.01", "flag=True",
                              "vals=1,2,3", "wh=(16,16)", "steps=[0,1,2]",
                              "names=a,b", "x=None"])
    assert args.cfg_options == {"model.lr": 0.01, "flag": True,
                                "vals": (1, 2, 3), "wh": (16, 16),
                                "steps": [0, 1, 2], "names": ["a", "b"],
                                "x": None}
