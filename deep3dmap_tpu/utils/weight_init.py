"""Config-driven weight initialization.

Parity: /root/reference/deep3dmap/core/utils/weight_init.py:691 — the
``init_cfg`` vocabulary (Normal/Xavier/Kaiming/Constant/Uniform/TruncNormal)
mapped onto flax initializers, plus an ``apply_init_cfg`` that re-initializes
matching parameter subtrees of an existing tree.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn


def build_initializer(cfg: dict):
    cfg = dict(cfg)
    t = cfg.pop("type").lower()
    if t == "normal":
        return nn.initializers.normal(cfg.get("std", 0.01))
    if t == "truncnormal":
        return nn.initializers.truncated_normal(cfg.get("std", 0.01))
    if t == "uniform":
        a, b = cfg.get("a", 0.0), cfg.get("b", 1.0)
        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, a, b)
        return init
    if t == "constant":
        return nn.initializers.constant(cfg.get("val", 0.0))
    if t == "xavier":
        dist = cfg.get("distribution", "uniform")
        return (nn.initializers.xavier_uniform() if dist == "uniform"
                else nn.initializers.xavier_normal())
    if t == "kaiming":
        dist = cfg.get("distribution", "normal")
        return (nn.initializers.kaiming_normal() if dist == "normal"
                else nn.initializers.kaiming_uniform())
    raise ValueError(f"unknown init type {t}")


def apply_init_cfg(params: Dict[str, Any], init_cfg, rng) -> Dict[str, Any]:
    """init_cfg: dict or list of dicts with optional ``layer_pattern`` regex
    matched against the flattened param path."""
    cfgs = init_cfg if isinstance(init_cfg, (list, tuple)) else [init_cfg]
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat[0], flat[1]

    new_leaves = []
    for path, leaf in leaves:
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        out = leaf
        for cfg in cfgs:
            pat = cfg.get("layer_pattern", ".*")
            if re.search(pat, path_str):
                rng, sub = jax.random.split(rng)
                init = build_initializer({k: v for k, v in cfg.items()
                                          if k != "layer_pattern"})
                out = init(sub, leaf.shape, leaf.dtype)
        new_leaves.append(out)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
