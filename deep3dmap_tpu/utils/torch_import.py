"""Torch-checkpoint -> flax-param importers.

The reference workloads start from pretrained torch checkpoints: the
StyleGAN2 prior for Gan2Shape (/root/reference/deep3dmap/models/frameworks/
gan2shape.py:119-131 loads generator/discriminator .pth), the VGG16 LPIPS
trunk for the perceptual loss (/root/reference/pnpmodules/stylegan2/
lpips/pretrained_networks.py), and parsing networks.  This module converts
those state dicts into the NHWC flax trees used here, so reference users can
carry their checkpoints over.

Conventions converted:
  torch conv weight  (O, I, kH, kW)  -> flax HWIO (kH, kW, I, O)
  torch linear weight (O, I)         -> flax (I, O)
  NCHW constant tensors              -> NHWC

Everything is numpy/host-side; ``state_dict`` values may be torch tensors or
numpy arrays (we never require torch at import time).
"""
from __future__ import annotations

import math
from typing import Dict, Mapping

import numpy as np

__all__ = [
    "to_numpy",
    "conv_kernel",
    "linear_kernel",
    "load_torch_state_dict",
    "import_stylegan2_generator",
    "import_stylegan2_discriminator",
    "import_vgg16_features",
    "import_mnasnet_trunk",
    "import_clip",
    "clip_cfg_from_state_dict",
    "import_bisenet",
    "fill_like",
    "merge_into",
]


def to_numpy(t) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (host)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def conv_kernel(t) -> np.ndarray:
    """(O, I, kH, kW) -> (kH, kW, I, O)."""
    return np.transpose(to_numpy(t), (2, 3, 1, 0))


def linear_kernel(t) -> np.ndarray:
    """(O, I) -> (I, O)."""
    return to_numpy(t).T


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth checkpoint to a flat {key: numpy} dict (host-side).

    Accepts raw state dicts and the common {'state_dict'|'g_ema'|'g'|'d':
    ...} wrappers used by stylegan2-pytorch checkpoints."""
    import torch  # local import: only needed when actually importing .pth

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, Mapping):
        for key in ("state_dict", "g_ema", "generator", "model"):
            if key in obj and isinstance(obj[key], Mapping):
                obj = obj[key]
                break
    return {k: to_numpy(v) for k, v in obj.items()
            if hasattr(v, "shape")}


def _strip_module(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def fill_like(template, flat: Dict[str, np.ndarray]):
    """Build a pytree shaped like ``template`` from a flat '/'-joined dict,
    asserting every leaf is present with the right shape."""
    import jax

    flat_template = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat_template[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in flat:
            raise KeyError(f"importer missing parameter {key!r} "
                           f"(expected shape {np.shape(leaf)})")
        arr = np.asarray(flat[key], np.float32).reshape(np.shape(leaf))
        leaves.append(arr)
    extra = set(flat) - {
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        for path, _ in flat_template[0]}
    if extra:
        raise KeyError(f"importer produced unknown parameters: {sorted(extra)}")
    return jax.tree_util.tree_unflatten(flat_template[1], leaves)


def _styled_conv(sd: Mapping[str, np.ndarray], src: str, dst: str,
                 out: Dict[str, np.ndarray]) -> None:
    """rosinality StyledConv `src.*` -> our StyledConv `dst/*`."""
    w = to_numpy(sd[f"{src}.conv.weight"])  # (1, O, I, k, k)
    out[f"{dst}/conv/weight"] = np.transpose(w[0], (2, 3, 1, 0))
    out[f"{dst}/conv/modulation/weight"] = linear_kernel(sd[f"{src}.conv.modulation.weight"])
    # our EqualDense 'modulation' adds +1.0 after bias; rosinality stores
    # bias_init=1 in the bias itself -> subtract the shift once here
    out[f"{dst}/conv/modulation/bias"] = to_numpy(sd[f"{src}.conv.modulation.bias"]) - 1.0
    out[f"{dst}/noise_strength"] = to_numpy(sd[f"{src}.noise.weight"]).reshape(())
    out[f"{dst}/bias"] = to_numpy(sd[f"{src}.activate.bias"])


def _to_rgb(sd: Mapping[str, np.ndarray], src: str, dst: str,
            out: Dict[str, np.ndarray]) -> None:
    w = to_numpy(sd[f"{src}.conv.weight"])  # (1, 3, I, 1, 1)
    out[f"{dst}/conv/weight"] = np.transpose(w[0], (2, 3, 1, 0))
    out[f"{dst}/conv/modulation/weight"] = linear_kernel(sd[f"{src}.conv.modulation.weight"])
    out[f"{dst}/conv/modulation/bias"] = to_numpy(sd[f"{src}.conv.modulation.bias"]) - 1.0
    out[f"{dst}/bias"] = to_numpy(sd[f"{src}.bias"]).reshape(3)


def import_stylegan2_generator(sd: Mapping[str, np.ndarray], size: int = 128,
                               n_mlp: int = 8):
    """rosinality stylegan2-pytorch Generator state dict -> flat param dict
    keyed 'params/<module>/<leaf>' for our modulars.stylegan2.Generator."""
    sd = _strip_module(sd)
    out: Dict[str, np.ndarray] = {}
    # mapping MLP: style.0 is PixelNorm (no params), style.1..n_mlp EqualLinear
    for i in range(n_mlp):
        out[f"mapping/dense_{i}/weight"] = linear_kernel(sd[f"style.{i + 1}.weight"])
        out[f"mapping/dense_{i}/bias"] = to_numpy(sd[f"style.{i + 1}.bias"])
    out["input_const"] = np.transpose(to_numpy(sd["input.input"]), (0, 2, 3, 1))
    _styled_conv(sd, "conv1", "conv1", out)
    _to_rgb(sd, "to_rgb1", "to_rgb1", out)
    log_size = int(math.log2(size))
    for j in range(log_size - 2):
        res = 8 * (2 ** j)
        _styled_conv(sd, f"convs.{2 * j}", f"conv_{res}_up", out)
        _styled_conv(sd, f"convs.{2 * j + 1}", f"conv_{res}", out)
        _to_rgb(sd, f"to_rgbs.{j}", f"to_rgb_{res}", out)
    return {"params/" + k: v for k, v in out.items()}


def import_stylegan2_discriminator(sd: Mapping[str, np.ndarray],
                                   size: int = 128,
                                   channel_multiplier: int = 2):
    """rosinality Discriminator state dict -> flat dict for our
    StyleDiscriminator."""
    sd = _strip_module(sd)
    out: Dict[str, np.ndarray] = {}
    out["from_rgb_weight"] = conv_kernel(sd["convs.0.0.weight"])
    out["frgb_b"] = to_numpy(sd["convs.0.1.bias"])
    log_size = int(math.log2(size))
    res = size
    for i in range(1, log_size - 1):
        dst = f"block_{res}"
        out[f"{dst}/conv1_weight"] = conv_kernel(sd[f"convs.{i}.conv1.0.weight"])
        out[f"{dst}/b1"] = to_numpy(sd[f"convs.{i}.conv1.1.bias"])
        out[f"{dst}/conv2_weight"] = conv_kernel(sd[f"convs.{i}.conv2.1.weight"])
        out[f"{dst}/b2"] = to_numpy(sd[f"convs.{i}.conv2.2.bias"])
        out[f"{dst}/skip_weight"] = conv_kernel(sd[f"convs.{i}.skip.1.weight"])
        res //= 2
    out["final_conv_weight"] = conv_kernel(sd["final_conv.0.weight"])
    out["fc_b"] = to_numpy(sd["final_conv.1.bias"])
    # torch flattens (C,4,4) row-major; we flatten (4,4,C) -> permute rows
    w0 = to_numpy(sd["final_linear.0.weight"])  # (O, C*16)
    ch4 = w0.shape[1] // 16
    w0 = w0.reshape(-1, ch4, 4, 4).transpose(0, 2, 3, 1).reshape(w0.shape[0], -1)
    out["final_dense/weight"] = w0.T
    out["final_dense/bias"] = to_numpy(sd["final_linear.0.bias"])
    out["out/weight"] = linear_kernel(sd["final_linear.1.weight"])
    out["out/bias"] = to_numpy(sd["final_linear.1.bias"])
    return {"params/" + k: v for k, v in out.items()}


def merge_into(template, flat: Dict[str, np.ndarray]):
    """Like ``fill_like`` but partial: leaves present in ``flat`` replace the
    template values (shape-checked); the rest keep their (fresh-init) values.
    Raises if ``flat`` has keys the template doesn't."""
    import jax

    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    used = set()
    leaves = []
    for path, leaf in paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key in flat:
            arr = np.asarray(flat[key], np.float32)
            if arr.shape != np.shape(leaf):
                raise ValueError(f"{key}: torch shape {arr.shape} != "
                                 f"flax shape {np.shape(leaf)}")
            leaves.append(arr)
            used.add(key)
        else:
            leaves.append(leaf)
    extra = set(flat) - used
    if extra:
        raise KeyError(f"importer produced unknown parameters: {sorted(extra)}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _fold_bn(sd: Mapping[str, np.ndarray], conv_key: str, bn_key: str,
             eps: float = 1e-5):
    """Fold eval-mode BatchNorm into the preceding conv: returns flax-layout
    (kernel HWIO, bias).  Exact for inference (BN(x*w) == x*w' + b')."""
    w = conv_kernel(sd[f"{conv_key}.weight"])  # (kH,kW,I,O)
    gamma = to_numpy(sd[f"{bn_key}.weight"])
    beta = to_numpy(sd[f"{bn_key}.bias"])
    mean = to_numpy(sd[f"{bn_key}.running_mean"])
    var = to_numpy(sd[f"{bn_key}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return w * scale, beta - mean * scale


def import_mnasnet_trunk(sd: Mapping[str, np.ndarray], template):
    """torchvision MNASNet state dict -> params for ``MnasFPN(norm="none",
    torch_pad=True)`` (parity: the reference builds its 2D trunk from
    *pretrained* torchvision MNASNet, /root/reference/deep3dmap/models/
    backbones/mnas_multi.py:24-33 ``MNASNet(alpha, pretrained=True)``,
    keeping ``layers[0:8]`` + stages 8/9/10).

    BatchNorms are folded into the convs (exact in eval mode); the FPN
    lateral/output convs have no torch source and keep the template's fresh
    init, matching the reference where the FPN layers are newly constructed
    (mnas_multi.py:40-55).

    Args:
        sd: torch state dict (``layers.N...`` keys; ``module.`` ok).
        template: params pytree from ``MnasFPN(norm="none",
            torch_pad=True).init(...)`` (pass the full FrozenDict/dict).
    """
    sd = _strip_module(sd)
    # some checkpoints nest the trunk (e.g. 'backbone2d.layers.0.weight');
    # keep everything from the first 'layers.' on
    if not any(k.startswith("layers.") for k in sd):
        sd = {"layers." + k.split("layers.", 1)[1]: v
              for k, v in sd.items() if "layers." in k}
    out: Dict[str, np.ndarray] = {}

    def put(dst, conv_key, bn_key):
        k, b = _fold_bn(sd, conv_key, bn_key)
        out[f"params/{dst}/kernel"] = k
        out[f"params/{dst}/bias"] = b

    # stem: layers 0/1 conv+BN, 3/4 depthwise+BN, 6/7 project+BN
    put("Conv_0", "layers.0", "layers.1")
    put("Conv_1", "layers.3", "layers.4")
    put("Conv_2", "layers.6", "layers.7")
    # stages 8/9/10 -> _Stack_0/1/2, each 3 _InvertedResidual blocks whose
    # inner Sequential is [0 expand, 1 BN, 3 depthwise, 4 BN, 6 project, 7 BN]
    for stack, layer in enumerate((8, 9, 10)):
        for block in range(3):
            src = f"layers.{layer}.{block}.layers"
            dst = f"_Stack_{stack}/MBConv_{block}"
            put(f"{dst}/Conv_0", f"{src}.0", f"{src}.1")
            put(f"{dst}/Conv_1", f"{src}.3", f"{src}.4")
            put(f"{dst}/Conv_2", f"{src}.6", f"{src}.7")
    return merge_into(template, out)


# torchvision vgg16 `features.` conv indices, in trunk order
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def import_vgg16_features(sd: Mapping[str, np.ndarray]):
    """torchvision vgg16 state dict (features.N.weight/bias) -> params for
    losses.perceptual_loss._VGGFeatures (13 convs, NHWC)."""
    sd = _strip_module(sd)
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    out: Dict[str, np.ndarray] = {}
    for n, idx in enumerate(_VGG16_CONV_IDX):
        out[f"params/Conv_{n}/kernel"] = conv_kernel(sd[f"{prefix}{idx}.weight"])
        out[f"params/Conv_{n}/bias"] = to_numpy(sd[f"{prefix}{idx}.bias"])
    return out


# ---------------------------------------------------------------------------
# CLIP (OpenAI / OpenCLIP ViT checkpoints) -> models/modulars/clip_vit.py
# ---------------------------------------------------------------------------

def clip_cfg_from_state_dict(sd: Mapping[str, np.ndarray]):
    """Recover (vision_cfg, text_cfg) from a CLIP ViT state dict, the same
    shape-sniffing the reference's build_model does
    (/root/reference/deep3dmap/models/modulars/clip/model.py:392-420)."""
    vw = sd["visual.conv1.weight"].shape
    vision_width, patch = int(vw[0]), int(vw[-1])
    vision_layers = len({k.split(".")[3] for k in sd
                         if k.startswith("visual.transformer.resblocks.")})
    grid = int(round(math.sqrt(sd["visual.positional_embedding"].shape[0] - 1)))
    embed_dim = int(sd["text_projection"].shape[1])
    text_width = int(sd["ln_final.weight"].shape[0])
    text_layers = len({k.split(".")[2] for k in sd
                       if k.startswith("transformer.resblocks.")})
    vision_cfg = dict(patch=patch, width=vision_width, layers=vision_layers,
                      heads=max(vision_width // 64, 1), embed_dim=embed_dim,
                      image_size=patch * grid)
    text_cfg = dict(vocab_size=int(sd["token_embedding.weight"].shape[0]),
                    ctx_len=int(sd["positional_embedding"].shape[0]),
                    width=text_width, layers=text_layers,
                    heads=max(text_width // 64, 1), embed_dim=embed_dim)
    return vision_cfg, text_cfg


def _clip_blocks(sd: Mapping[str, np.ndarray], prefix: str, layers: int,
                 out: Dict[str, np.ndarray]) -> None:
    for i in range(layers):
        src = f"{prefix}transformer.resblocks.{i}"
        dst = f"resblock{i}"
        out[f"{dst}/ln_1/scale"] = to_numpy(sd[f"{src}.ln_1.weight"])
        out[f"{dst}/ln_1/bias"] = to_numpy(sd[f"{src}.ln_1.bias"])
        out[f"{dst}/attn/in_proj/kernel"] = linear_kernel(sd[f"{src}.attn.in_proj_weight"])
        out[f"{dst}/attn/in_proj/bias"] = to_numpy(sd[f"{src}.attn.in_proj_bias"])
        out[f"{dst}/attn/out_proj/kernel"] = linear_kernel(sd[f"{src}.attn.out_proj.weight"])
        out[f"{dst}/attn/out_proj/bias"] = to_numpy(sd[f"{src}.attn.out_proj.bias"])
        out[f"{dst}/ln_2/scale"] = to_numpy(sd[f"{src}.ln_2.weight"])
        out[f"{dst}/ln_2/bias"] = to_numpy(sd[f"{src}.ln_2.bias"])
        out[f"{dst}/mlp_c_fc/kernel"] = linear_kernel(sd[f"{src}.mlp.c_fc.weight"])
        out[f"{dst}/mlp_c_fc/bias"] = to_numpy(sd[f"{src}.mlp.c_fc.bias"])
        out[f"{dst}/mlp_c_proj/kernel"] = linear_kernel(sd[f"{src}.mlp.c_proj.weight"])
        out[f"{dst}/mlp_c_proj/bias"] = to_numpy(sd[f"{src}.mlp.c_proj.bias"])


def import_clip(sd: Mapping[str, np.ndarray]):
    """OpenAI/OpenCLIP ViT CLIP state dict -> (vision_cfg, text_cfg,
    vision_params, text_params, logit_scale) for clip_vit.CLIPViT.

    Key-matched: every transformer/embedding/projection weight of the
    published checkpoints loads; fails loudly on any mismatch (fill_like)."""
    import jax
    import jax.numpy as jnp

    from ..models.modulars.clip_vit import TextTransformer, VisionTransformer

    sd = _strip_module(sd)
    vision_cfg, text_cfg = clip_cfg_from_state_dict(sd)

    v: Dict[str, np.ndarray] = {}
    v["class_embedding"] = to_numpy(sd["visual.class_embedding"])
    v["positional_embedding"] = to_numpy(sd["visual.positional_embedding"])
    v["conv1/kernel"] = conv_kernel(sd["visual.conv1.weight"])
    v["ln_pre/scale"] = to_numpy(sd["visual.ln_pre.weight"])
    v["ln_pre/bias"] = to_numpy(sd["visual.ln_pre.bias"])
    _clip_blocks(sd, "visual.", vision_cfg["layers"], v)
    v["ln_post/scale"] = to_numpy(sd["visual.ln_post.weight"])
    v["ln_post/bias"] = to_numpy(sd["visual.ln_post.bias"])
    v["proj"] = to_numpy(sd["visual.proj"])  # stored (width, embed) already

    t: Dict[str, np.ndarray] = {}
    t["token_embedding/embedding"] = to_numpy(sd["token_embedding.weight"])
    t["positional_embedding"] = to_numpy(sd["positional_embedding"])
    _clip_blocks(sd, "", text_cfg["layers"], t)
    t["ln_final/scale"] = to_numpy(sd["ln_final.weight"])
    t["ln_final/bias"] = to_numpy(sd["ln_final.bias"])
    t["text_projection"] = to_numpy(sd["text_projection"])

    rng = jax.random.PRNGKey(0)
    s = vision_cfg["image_size"]
    v_tpl = VisionTransformer(**vision_cfg).init(rng, jnp.zeros((1, s, s, 3)))
    t_tpl = TextTransformer(**text_cfg).init(
        rng, jnp.zeros((1, text_cfg["ctx_len"]), jnp.int32))
    vision_params = fill_like(v_tpl, {"params/" + k: x for k, x in v.items()})
    text_params = fill_like(t_tpl, {"params/" + k: x for k, x in t.items()})
    logit_scale = float(np.exp(to_numpy(sd["logit_scale"]))) if "logit_scale" in sd else 100.0
    return vision_cfg, text_cfg, vision_params, text_params, logit_scale


# ---------------------------------------------------------------------------
# DINO ViT -> models/modulars/dino_vit.py
# ---------------------------------------------------------------------------

def dino_cfg_from_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, int]:
    """Infer (patch_size, dim, depth, heads, base_grid) from a DINO ViT
    state dict (facebookresearch/dino vision_transformer.py layout)."""
    w = np.asarray(sd["patch_embed.proj.weight"])       # (D, 3, p, p)
    dim, patch = int(w.shape[0]), int(w.shape[2])
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    n_pos = int(np.asarray(sd["pos_embed"]).shape[1]) - 1
    base_grid = int(round(n_pos ** 0.5))
    heads = {384: 6, 768: 12, 192: 3, 1024: 16}[dim]    # DINO family
    return dict(patch_size=patch, dim=dim, depth=depth, heads=heads,
                mlp_ratio=4, base_grid=base_grid)


def import_dino(sd: Mapping[str, np.ndarray]):
    """DINO ViT checkpoint (dino_vits8/vits16/vitb8/vitb16) ->
    (cfg, params) for modulars/dino_vit.DinoViT.

    Key-matched via fill_like: every weight of the published checkpoints
    loads (head weights, if present, are ignored — the extractor only uses
    backbone facets, matching the reference dino_extractor)."""
    import jax
    import jax.numpy as jnp

    from ..models.modulars.dino_vit import DinoViT

    sd = _strip_module(sd)
    sd = {k: v for k, v in sd.items() if not k.startswith("head.")}
    cfg = dino_cfg_from_state_dict(sd)

    flat: Dict[str, np.ndarray] = {}
    flat["cls_token"] = to_numpy(sd["cls_token"])
    flat["pos_embed"] = to_numpy(sd["pos_embed"])
    flat["patch_embed/kernel"] = conv_kernel(sd["patch_embed.proj.weight"])
    flat["patch_embed/bias"] = to_numpy(sd["patch_embed.proj.bias"])
    for i in range(cfg["depth"]):
        src, dst = f"blocks.{i}", f"block{i}"
        flat[f"{dst}/norm1/scale"] = to_numpy(sd[f"{src}.norm1.weight"])
        flat[f"{dst}/norm1/bias"] = to_numpy(sd[f"{src}.norm1.bias"])
        flat[f"{dst}/qkv/kernel"] = linear_kernel(sd[f"{src}.attn.qkv.weight"])
        flat[f"{dst}/qkv/bias"] = to_numpy(sd[f"{src}.attn.qkv.bias"])
        flat[f"{dst}/proj/kernel"] = linear_kernel(sd[f"{src}.attn.proj.weight"])
        flat[f"{dst}/proj/bias"] = to_numpy(sd[f"{src}.attn.proj.bias"])
        flat[f"{dst}/norm2/scale"] = to_numpy(sd[f"{src}.norm2.weight"])
        flat[f"{dst}/norm2/bias"] = to_numpy(sd[f"{src}.norm2.bias"])
        flat[f"{dst}/fc1/kernel"] = linear_kernel(sd[f"{src}.mlp.fc1.weight"])
        flat[f"{dst}/fc1/bias"] = to_numpy(sd[f"{src}.mlp.fc1.bias"])
        flat[f"{dst}/fc2/kernel"] = linear_kernel(sd[f"{src}.mlp.fc2.weight"])
        flat[f"{dst}/fc2/bias"] = to_numpy(sd[f"{src}.mlp.fc2.bias"])
    flat["norm/scale"] = to_numpy(sd["norm.weight"])
    flat["norm/bias"] = to_numpy(sd["norm.bias"])

    s = cfg["patch_size"] * 4  # param shapes don't depend on input size
    tpl = jax.eval_shape(DinoViT(**cfg).init, jax.random.PRNGKey(0),
                         jnp.zeros((1, s, s, 3)))
    tpl = jax.tree_util.tree_map(lambda x: np.zeros(x.shape, x.dtype), tpl)
    params = fill_like(tpl, {"params/" + k: x for k, x in flat.items()})
    return cfg, params


# ---------------------------------------------------------------------------
# face-parsing BiSeNet -> models/parsing/bisenet_fp.py
# ---------------------------------------------------------------------------

def import_bisenet(sd: Mapping[str, np.ndarray], n_classes: int = 19):
    """face-parsing BiSeNet checkpoint (the one the reference's Gan2Shape
    loads, gan2shape.py:316-317) -> params for parsing.bisenet_fp.BiSeNetFP.

    BatchNorms fold into the preceding convs (exact for the eval-mode use).
    Aux training heads (conv_out16/conv_out32) are dropped — the reference's
    forward also only consumes out[0] (gan2shape.py:346-347)."""
    import jax
    import jax.numpy as jnp

    from ..models.parsing.bisenet_fp import BiSeNetFP

    sd = _strip_module(sd)
    out: Dict[str, np.ndarray] = {}

    def put(dst, conv_key, bn_key):
        k, b = _fold_bn(sd, conv_key, bn_key)
        out[f"params/{dst}/kernel"] = k
        out[f"params/{dst}/bias"] = b

    put("resnet/conv1", "cp.resnet.conv1", "cp.resnet.bn1")
    for L, ch in ((1, 64), (2, 128), (3, 256), (4, 512)):
        for B in range(2):
            src = f"cp.resnet.layer{L}.{B}"
            dst = f"resnet/layer{L}_{B}"
            put(f"{dst}/conv1", f"{src}.conv1", f"{src}.bn1")
            put(f"{dst}/conv2", f"{src}.conv2", f"{src}.bn2")
            if L > 1 and B == 0:
                put(f"{dst}/downsample", f"{src}.downsample.0",
                    f"{src}.downsample.1")
    for arm in ("arm16", "arm32"):
        put(f"{arm}/conv", f"cp.{arm}.conv.conv", f"cp.{arm}.conv.bn")
        put(f"{arm}/conv_atten", f"cp.{arm}.conv_atten", f"cp.{arm}.bn_atten")
    put("conv_avg", "cp.conv_avg.conv", "cp.conv_avg.bn")
    put("conv_head16", "cp.conv_head16.conv", "cp.conv_head16.bn")
    put("conv_head32", "cp.conv_head32.conv", "cp.conv_head32.bn")
    put("ffm_convblk", "ffm.convblk.conv", "ffm.convblk.bn")
    out["params/ffm_conv1/kernel"] = conv_kernel(sd["ffm.conv1.weight"])
    out["params/ffm_conv2/kernel"] = conv_kernel(sd["ffm.conv2.weight"])
    put("out_conv", "conv_out.conv.conv", "conv_out.conv.bn")
    out["params/out_cls/kernel"] = conv_kernel(sd["conv_out.conv_out.weight"])
    out["params/out_cls/bias"] = (
        to_numpy(sd["conv_out.conv_out.bias"])
        if "conv_out.conv_out.bias" in sd
        else np.zeros(sd["conv_out.conv_out.weight"].shape[0], np.float32))

    template = jax.jit(BiSeNetFP(n_classes=n_classes).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return fill_like(template, out)
