"""Full CLIP (OpenAI architecture) — ViT vision tower + text transformer.

Capability parity with the reference's vendored OpenAI CLIP
(/root/reference/deep3dmap/models/modulars/clip/model.py:436,
clip.py:237, simple_tokenizer.py:132), which LERF uses through
ns_encoders/{clip,openclip}_encoder.py.  Unlike the compact stand-in in
``clip_encoder.py`` (random-init pipeline testing), this module reproduces
the published architecture exactly, so released OpenAI/OpenCLIP ViT
checkpoints import key-for-key (utils/torch_import.py ``import_clip`` →
``tools/import_weights.py clip``).

Architecture (ViT-B/16 defaults; sizes are inferred from checkpoints):
  vision: conv patch embed → [CLS; patches] + pos-embed → ln_pre →
          L× (ln1 → MHA → residual → ln2 → MLP(QuickGELU) → residual)
          → ln_post[CLS] → proj  (768 → 512)
  text:   token embed + pos embed → causal transformer (512 × 12 × 8 heads)
          → ln_final[argmax(tokens)] → text_projection
  QuickGELU(x) = x · sigmoid(1.702 x)

TPU notes: pure dense transformer — everything lands on the MXU; run with
``jnp.bfloat16`` inputs for inference (params stay fp32, matmuls in bf16 via
XLA's default mixed precision when inputs are bf16).

The BPE tokenizer (``BPETokenizer``) implements the public byte-pair-encoding
scheme CLIP uses; it requires the standard gzip vocab file
(``bpe_simple_vocab_16e6.txt.gz``) supplied by the user — no vendored assets.
"""
from __future__ import annotations

import gzip
import html
from functools import lru_cache
from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention layout: fused qkv in-proj + out-proj.

    Parameters are stored exactly as the torch module factors them
    (in_proj: (3d, d) weight + (3d,) bias; out_proj: (d, d)), so checkpoint
    import is a transpose, nothing else.
    """

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        B, L, D = x.shape
        qkv = nn.Dense(3 * D, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = D // self.heads

        def heads(t):
            return t.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        if mask is not None:
            att = att + mask
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(D, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        x = x + MultiheadAttention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(name="ln_1")(x), mask)
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.dim * 4, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        return x + nn.Dense(self.dim, name="mlp_c_proj")(h)


class VisionTransformer(nn.Module):
    """CLIP vision tower. Input (B, H, W, 3) normalized images (CLIP mean/std)."""

    patch: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    image_size: int = 224

    @nn.compact
    def __call__(self, img):
        B = img.shape[0]
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), use_bias=False,
                    name="conv1")(img)
        x = x.reshape(B, -1, self.width)  # (B, grid², width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (B, 1, self.width)).astype(x.dtype), x], 1)
        n_pos = (self.image_size // self.patch) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (n_pos, self.width))
        if x.shape[1] != n_pos:
            # arbitrary input resolution: bilinear-resize the grid pos-embed
            pos = _resize_pos_embed(pos, x.shape[1])
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       name=f"resblock{i}")(x)
        x = nn.LayerNorm(name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.embed_dim))
        return x @ proj.astype(x.dtype)


def _resize_pos_embed(pos, n_new):
    """Resize a (1+g², w) CLIP pos-embed to (1+g'², w) via bilinear resize."""
    cls, grid = pos[:1], pos[1:]
    g = int(round(float(np.sqrt(grid.shape[0]))))
    g_new = int(round(float(np.sqrt(n_new - 1))))
    grid = grid.reshape(g, g, -1)
    grid = jax.image.resize(grid, (g_new, g_new, grid.shape[-1]), "bilinear")
    return jnp.concatenate([cls, grid.reshape(g_new * g_new, -1)], axis=0)


class TextTransformer(nn.Module):
    """CLIP text tower. Input (B, 77) int32 BPE tokens."""

    vocab_size: int = 49408
    ctx_len: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512

    @nn.compact
    def __call__(self, tokens):
        B, L = tokens.shape
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.ctx_len, self.width))
        x = x + pos[None, :L].astype(x.dtype)
        mask = jnp.triu(jnp.full((L, L), -jnp.inf, x.dtype), k=1)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       name=f"resblock{i}")(x, mask)
        x = nn.LayerNorm(name="ln_final")(x)
        # features at the EOT token (highest token id) — model.py encode_text
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(B), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.01),
                          (self.width, self.embed_dim))
        return x @ proj.astype(x.dtype)


class CLIPViT:
    """Bundled CLIP model: init from config or from an imported .npz tree.

    ``from_npz(path)`` loads the output of ``tools/import_weights.py clip``;
    sizes are recovered from the stored arrays, so any released ViT CLIP
    (B/32, B/16, L/14, OpenCLIP ViT variants) works.
    """

    IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def __init__(self, vision_cfg: Dict[str, Any], text_cfg: Dict[str, Any],
                 vision_params=None, text_params=None, logit_scale: float = 100.0,
                 seed: int = 0):
        self.visual = VisionTransformer(**vision_cfg)
        self.text = TextTransformer(**text_cfg)
        self.logit_scale = float(logit_scale)
        if vision_params is None:
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            s = vision_cfg.get("image_size", 224)
            vision_params = self.visual.init(k1, jnp.zeros((1, s, s, 3)))
            text_params = self.text.init(
                k2, jnp.zeros((1, text_cfg.get("ctx_len", 77)), jnp.int32))
        self.vision_params = vision_params
        self.text_params = text_params
        self._enc_img = jax.jit(self.visual.apply)
        self._enc_txt = jax.jit(self.text.apply)

    @classmethod
    def from_npz(cls, path: str) -> "CLIPViT":
        data = np.load(path, allow_pickle=True)
        vision = jax.tree_util.tree_map(jnp.asarray, data["vision"].item())
        text = jax.tree_util.tree_map(jnp.asarray, data["text"].item())
        meta = data["meta"].item()
        return cls(meta["vision_cfg"], meta["text_cfg"],
                   vision_params=vision, text_params=text,
                   logit_scale=meta.get("logit_scale", 100.0))

    def preprocess(self, imgs: np.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) uint8/float [0,1] -> CLIP-normalized float32."""
        x = np.asarray(imgs, np.float32)
        if x.max() > 1.5:
            x = x / 255.0
        return jnp.asarray((x - self.IMAGE_MEAN) / self.IMAGE_STD)

    def encode_image(self, imgs, normalize: bool = True) -> jnp.ndarray:
        z = self._enc_img(self.vision_params, imgs)
        if normalize:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-9)
        return z

    def encode_text(self, tokens, normalize: bool = True) -> jnp.ndarray:
        z = self._enc_txt(self.text_params, jnp.asarray(tokens, jnp.int32))
        if normalize:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-9)
        return z


# ---------------------------------------------------------------------------
# BPE tokenizer (public algorithm; vocab file supplied by the user)
# ---------------------------------------------------------------------------

@lru_cache()
def bytes_to_unicode():
    """Reversible byte→unicode map (the standard GPT-2/CLIP construction)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class BPETokenizer:
    """CLIP's lower-cased BPE tokenizer.

    Args:
        bpe_path: path to ``bpe_simple_vocab_16e6.txt.gz`` (the public CLIP
            vocab). Download separately; not vendored.
    """

    def __init__(self, bpe_path: str, ctx_len: int = 77):
        self.ctx_len = ctx_len
        self.byte_encoder = bytes_to_unicode()
        merges = gzip.open(bpe_path, "rt", encoding="utf-8").read().split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        import re
        # CLIP's pattern uses \p{L}/\p{N} via the `regex` module; the stdlib
        # equivalent below matches it for ASCII text (unicode letters fall
        # into the catch-all class, still tokenizable byte-wise)
        self._pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""", re.IGNORECASE)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text)).strip().lower()
        text = " ".join(text.split())
        ids: List[int] = []
        for tok in self._pat.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        out = np.zeros((len(texts), self.ctx_len), np.int32)
        for i, t in enumerate(texts):
            toks = [sot] + self.encode(t)[: self.ctx_len - 2] + [eot]
            out[i, :len(toks)] = toks
        return out
