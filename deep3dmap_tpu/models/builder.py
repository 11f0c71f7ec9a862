"""Model registries.

Parity: /root/reference/deep3dmap/models/builder.py:43-66 — MODELS /
BACKBONES / LOSSES / RECONSTRUCTORS registries and ``build_reconstruction``.
"""
from ..utils.registry import Registry

MODELS = Registry("models")
BACKBONES = Registry("backbone", parent=MODELS)
LOSSES = Registry("loss", parent=MODELS)
RECONSTRUCTORS = Registry("reconstructor", parent=MODELS)


def build_backbone(cfg, **default_args):
    return BACKBONES.build(dict(cfg), **default_args)


def build_loss(cfg, **default_args):
    return LOSSES.build(dict(cfg), **default_args)


def build_reconstruction(cfg, train_cfg=None, test_cfg=None):
    cfg = dict(cfg)
    if train_cfg is not None:
        cfg.setdefault("train_cfg", train_cfg)
    if test_cfg is not None:
        cfg.setdefault("test_cfg", test_cfg)
    return RECONSTRUCTORS.build(cfg)
