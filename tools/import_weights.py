#!/usr/bin/env python
"""Convert reference torch checkpoints into flax .npz weight files.

Reference users carry over their pretrained assets with:

  # rosinality stylegan2-pytorch checkpoint ({'g_ema'|'g': ..., 'd': ...})
  python tools/import_weights.py stylegan2 ckpt.pth out.npz --size 128
  # -> out.npz with 'g'/'d' object trees, consumable as Gan2Shape gan_ckpt
  #    (deep3dmap_tpu/models/frameworks/gan2shape.py loads ["g"]/["d"])

  # torchvision vgg16 (for the LPIPS-style PerceptualLoss weights_path)
  python tools/import_weights.py vgg16 vgg16.pth out.npz

  # torchvision mnasnet1_0 (NeuralRecon 2D trunk; the reference builds it
  # from pretrained MNASNet, mnas_multi.py:26; like the reference, pretrained
  # import is alpha=1.0 only — see --alpha help). Point the model at the npz
  # via BACKBONE2D=dict(ARC="fpn-mnas-1", NORM="none", TORCH_PAD=True,
  # CKPT="out.npz", FREEZE=True) or the NeuralRecon(pretrained=...) arg;
  # the params are grafted under params/backbone2d/fpn at init time
  # (models/frameworks/neuralrecon.py _graft_backbone).
  python tools/import_weights.py mnasnet mnasnet1.0.pth out.npz --alpha 1.0

Parity surface: the reference initializes Gan2Shape from StyleGAN2 .pth
checkpoints (/root/reference/deep3dmap/models/frameworks/gan2shape.py:119-131)
and LPIPS from pretrained VGG (/root/reference/pnpmodules/stylegan2/lpips/).
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind", choices=["stylegan2", "stylegan2_g", "stylegan2_d",
                                     "vgg16", "mnasnet", "clip", "bisenet",
                                     "dino"])
    ap.add_argument("src", help=".pth checkpoint path")
    ap.add_argument("dst", help="output .npz path")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--n-mlp", type=int, default=8)
    ap.add_argument("--channel-multiplier", type=int, default=2)
    ap.add_argument("--style-dim", type=int, default=512)
    ap.add_argument("--alpha", type=float, default=1.0,
                    help="MNASNet depth multiplier (mnasnet kind). Only "
                         "alpha=1.0 torchvision checkpoints are importable: "
                         "pretrained mnasnet0_5/0_75 use the v1 fixed "
                         "32-channel stem, whose shapes don't match the "
                         "alpha-scaled stem here — matching the reference, "
                         "which only sets pretrained=True for alpha==1.0 "
                         "(mnas_multi.py:26).")
    args = ap.parse_args()

    # host-side conversion tool: never claim the TPU
    import jax
    jax.config.update("jax_platforms", "cpu")

    import torch  # noqa: F401 (ensure clear error before heavy imports)
    from deep3dmap_tpu.utils.torch_import import (
        fill_like, import_stylegan2_discriminator, import_stylegan2_generator,
        import_vgg16_features, to_numpy)

    raw = torch.load(args.src, map_location="cpu", weights_only=True)

    def tree_for(flat, model, example):
        import jax
        template = jax.jit(lambda k: model.init(k, example))(
            jax.random.PRNGKey(0))
        return jax.tree_util.tree_map(np.asarray, fill_like(template, flat))

    out = {}
    if args.kind.startswith("stylegan2"):
        import jax.numpy as jnp
        from deep3dmap_tpu.models.modulars.stylegan2 import (Generator,
                                                             StyleDiscriminator)
        z = jnp.zeros((1, args.style_dim))
        img = jnp.zeros((1, args.size, args.size, 3))
        if args.kind in ("stylegan2", "stylegan2_g"):
            g_sd = raw.get("g_ema", raw.get("g", raw))
            g_sd = {k: to_numpy(v) for k, v in g_sd.items() if hasattr(v, "shape")}
            flat = import_stylegan2_generator(g_sd, size=args.size,
                                              n_mlp=args.n_mlp)
            g = Generator(size=args.size, style_dim=args.style_dim,
                          n_mlp=args.n_mlp,
                          channel_multiplier=args.channel_multiplier)
            import jax
            template = jax.jit(lambda k: g.init({"params": k, "noise": k}, z))(
                jax.random.PRNGKey(0))
            out["g"] = np.array(
                jax.tree_util.tree_map(np.asarray, fill_like(template, flat)),
                dtype=object)
        if args.kind in ("stylegan2", "stylegan2_d"):
            d_sd = raw.get("d", raw)
            d_sd = {k: to_numpy(v) for k, v in d_sd.items() if hasattr(v, "shape")}
            flat = import_stylegan2_discriminator(
                d_sd, size=args.size, channel_multiplier=args.channel_multiplier)
            d = StyleDiscriminator(size=args.size,
                                   channel_multiplier=args.channel_multiplier)
            out["d"] = np.array(tree_for(flat, d, img), dtype=object)
    elif args.kind == "mnasnet":
        import jax
        import jax.numpy as jnp
        from deep3dmap_tpu.models.backbones.fpn2d import MnasFPN
        from deep3dmap_tpu.utils.torch_import import import_mnasnet_trunk
        sd = raw.get("state_dict", raw)
        sd = {k: to_numpy(v) for k, v in sd.items() if hasattr(v, "shape")}
        mnas = MnasFPN(alpha=args.alpha, norm="none", torch_pad=True)
        template = jax.jit(mnas.init)(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 64, 64, 3)))  # NHWC
        params = import_mnasnet_trunk(sd, template)
        out["params"] = np.array(
            jax.tree_util.tree_map(np.asarray, params), dtype=object)
    elif args.kind == "clip":
        # OpenAI/OpenCLIP ViT checkpoint (state dict or jit archive already
        # unwrapped to a state dict) -> CLIPViT npz: vision/text trees + meta.
        # Load with models/modulars/clip_vit.CLIPViT.from_npz, or point the
        # LERF config's clip_weights at it (parity: the reference's LERF
        # uses pretrained OpenCLIP ViT-B/16, ns_encoders/openclip_encoder.py).
        import jax
        from deep3dmap_tpu.utils.torch_import import import_clip
        sd = raw.get("state_dict", raw)
        sd = {k: to_numpy(v) for k, v in sd.items() if hasattr(v, "shape")}
        vision_cfg, text_cfg, vp, tp, logit_scale = import_clip(sd)
        out["vision"] = np.array(jax.tree_util.tree_map(np.asarray, vp),
                                 dtype=object)
        out["text"] = np.array(jax.tree_util.tree_map(np.asarray, tp),
                               dtype=object)
        out["meta"] = np.array(dict(vision_cfg=vision_cfg, text_cfg=text_cfg,
                                    logit_scale=logit_scale), dtype=object)
    elif args.kind == "dino":
        # DINO ViT checkpoint (dino_vits8 etc.) -> DinoViT npz.  Load with
        # models/modulars/dino_vit.DinoExtractor.from_npz or point the LERF
        # config's dino_npz at it (parity: the reference's DINO extractor,
        # datasets/ns/dataloaders/dino_extractor.py).
        import jax
        from deep3dmap_tpu.utils.torch_import import import_dino
        sd = raw.get("state_dict", raw)
        sd = {k: to_numpy(v) for k, v in sd.items() if hasattr(v, "shape")}
        cfg, params = import_dino(sd)
        out["params"] = np.array(
            jax.tree_util.tree_map(np.asarray, params), dtype=object)
        out["meta"] = np.array(cfg, dtype=object)
    elif args.kind == "bisenet":
        # face-parsing BiSeNet checkpoint -> BiSeNetFP params (BN folded).
        # Use as Gan2Shape model_cfgs parsing_ckpt (use_mask=True).
        import jax
        from deep3dmap_tpu.utils.torch_import import import_bisenet
        sd = raw.get("state_dict", raw)
        sd = {k: to_numpy(v) for k, v in sd.items() if hasattr(v, "shape")}
        params = import_bisenet(sd)
        out["params"] = np.array(
            jax.tree_util.tree_map(np.asarray, params), dtype=object)
    else:  # vgg16
        from deep3dmap_tpu.models.losses.perceptual_loss import _VGGFeatures
        import jax.numpy as jnp
        sd = raw.get("state_dict", raw)
        sd = {k: to_numpy(v) for k, v in sd.items() if hasattr(v, "shape")}
        flat = import_vgg16_features(sd)
        out["params"] = np.array(
            tree_for(flat, _VGGFeatures(), jnp.zeros((1, 64, 64, 3))),
            dtype=object)

    np.savez(args.dst, **out)
    for k, v in out.items():
        n = sum(getattr(x, "size", 0) for x in _leaves(v.item()))
        print(f"wrote {k}: {n / 1e6:.2f}M params")


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
