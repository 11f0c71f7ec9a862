"""DINO Vision Transformer feature extractor (ViT-S/8 default).

Capability parity with the reference's DINO extractor
(/root/reference/deep3dmap/datasets/ns/dataloaders/dino_extractor.py:1-363 +
dino_dataloader.py: dino_vits8, layer 11, facet 'key'): per-patch dense
descriptors from a DINO-pretrained ViT — the keys of a chosen attention
layer, heads concatenated — used as LERF's dino regularization target.

Architecture (facebookresearch/dino vision_transformer.py, ViT-S/8):
  conv patch embed (8x8 stride 8) -> [CLS; patches] + interpolated pos-embed
  -> 12x (ln1 -> MHA(fused qkv) -> residual -> ln2 -> MLP(GELU) -> residual)
  -> final ln.   dim=384, 6 heads.

Checkpoints import key-for-key via utils/torch_import.import_dino (pattern:
import_clip -> modulars/clip_vit.py).  Without a checkpoint, the extractor
runs the same architecture with deterministic random init — a fixed
nonlinear visual feature map (useful for synthetic pipeline tests), clearly
labelled so real LERF runs supply dino_npz.

TPU notes: pure dense transformer (MXU); arbitrary image sizes are handled
by bicubic pos-embed interpolation exactly like the reference's
interpolate_pos_encoding (dino_extractor.py:92-120).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DinoBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, capture: Optional[str] = None):
        """Returns (x, captured) where captured is the requested facet
        ('key'|'query'|'value'|'attn'|'token') or None."""
        B, L, D = x.shape
        hd = D // self.heads
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * D, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        captured = {"key": k, "query": q, "value": v}.get(capture)

        def heads(t):
            return t.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(hd).astype(x.dtype)
        att = jax.nn.softmax(att, axis=-1)
        if capture == "attn":
            captured = att
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + nn.Dense(D, name="proj")(out)
        y2 = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.mlp_ratio * D, name="fc1")(y2)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(D, name="fc2")(h)
        if capture == "token":
            captured = x
        return x, captured


class DinoViT(nn.Module):
    """DINO VisionTransformer; __call__ returns (patch_facet, cls_embed).

    patch_facet: (B, h, w, dim) — the requested facet at ``layer`` for the
    patch tokens (CLS dropped), heads concatenated (= 'descriptors' with
    bin=False in the reference extractor).
    """

    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    heads: int = 6
    mlp_ratio: int = 4
    base_grid: int = 28  # pos-embed grid of the checkpoint (224/8)

    @nn.compact
    def __call__(self, img, layer: int = 11, facet: str = "key"):
        B, H, W, _ = img.shape
        p = self.patch_size
        x = nn.Conv(self.dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(img)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(B, h * w, self.dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + self.base_grid ** 2, self.dim))
        # interpolate the patch pos-embed to the (h, w) token grid
        # (dino_extractor.py:92-120 interpolate_pos_encoding)
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (h, w) != (self.base_grid, self.base_grid):
            g = self.base_grid
            pp = pos_patch.reshape(1, g, g, self.dim)
            pp = jax.image.resize(pp, (1, h, w, self.dim), "bicubic")
            pos_patch = pp.reshape(1, h * w, self.dim)
        x = x + pos_patch
        cls_tok = jnp.tile(cls + pos_cls, (B, 1, 1))
        x = jnp.concatenate([cls_tok, x], axis=1)

        captured = None
        for i in range(self.depth):
            x, cap = DinoBlock(self.dim, self.heads, self.mlp_ratio,
                               name=f"block{i}")(
                x, capture=facet if i == layer else None)
            if cap is not None:
                captured = cap
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        if captured is None:
            captured = x  # facet past the last layer: final tokens
        patch_facet = captured[:, 1:].reshape(B, h, w, -1)
        return patch_facet, x[:, 0]


class DinoExtractor:
    """Host-facing wrapper: preprocess + jitted dense-descriptor extraction.

    With ``params=None`` the architecture runs with deterministic random
    init (synthetic tests); real runs load an imported checkpoint via
    :meth:`from_npz` (tools/import_weights.py dino)."""

    def __init__(self, params=None, cfg: Optional[Dict[str, Any]] = None,
                 layer: int = 11, facet: str = "key", seed: int = 0):
        self.cfg = dict(patch_size=8, dim=384, depth=12, heads=6,
                        mlp_ratio=4, base_grid=28)
        if cfg:
            self.cfg.update(cfg)
        self.layer = layer
        self.facet = facet
        self.net = DinoViT(**self.cfg)
        self.params = params
        self.pretrained = params is not None
        self._seed = seed
        self._jit = {}

    @classmethod
    def from_npz(cls, path: str, layer: int = 11, facet: str = "key"):
        """Load an imported DINO checkpoint (tools/import_weights.py dino:
        npz with params=<pytree>, meta=<cfg dict>)."""
        data = np.load(path, allow_pickle=True)
        cfg = data["meta"].item() if "meta" in data else None
        params = jax.tree_util.tree_map(jnp.asarray, data["params"].item())
        return cls(params=params, cfg=cfg, layer=layer, facet=facet)

    def _ensure_params(self, img):
        if self.params is None:
            self.params = jax.jit(partial(self.net.init, layer=self.layer,
                                          facet=self.facet))(
                jax.random.PRNGKey(self._seed), img)

    @property
    def embed_dim(self):
        return self.cfg["dim"]

    def preprocess(self, imgs01: np.ndarray) -> jnp.ndarray:
        """[0,1] RGB (B, H, W, 3) -> ImageNet-normalized, patch-aligned."""
        x = (np.asarray(imgs01, np.float32) - IMAGENET_MEAN) / IMAGENET_STD
        p = self.cfg["patch_size"]
        H, W = x.shape[1], x.shape[2]
        x = x[:, :H - H % p, :W - W % p]
        return jnp.asarray(x)

    def extract(self, imgs01: np.ndarray) -> np.ndarray:
        """[0,1] images -> (B, h, w, dim) patch-grid descriptors."""
        x = self.preprocess(imgs01)
        self._ensure_params(x[:1])
        key = x.shape
        if key not in self._jit:
            self._jit[key] = jax.jit(partial(
                self.net.apply, layer=self.layer, facet=self.facet))
        feats, _ = self._jit[key](self.params, x)
        return np.asarray(jax.device_get(feats))
