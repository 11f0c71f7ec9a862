"""Compact CLIP (image ViT + text transformer) with relevancy scoring.

Capability parity with the reference's vendored OpenAI CLIP
(/root/reference/deep3dmap/models/modulars/clip/model.py:436 +
ns_encoders/{clip,openclip}_encoder.py): joint image/text embedding space
and LERF's relevancy computation — softmax over [positive, canonical
negatives] cosine similarities at temperature 10, taking the minimum over
negatives (the LERF paper's pairwise formulation).

Pretrained weights load from an .npz tree (``weights_path``); random init
otherwise (embeddings remain a consistent joint space for pipeline tests).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CANONICAL_NEGATIVES = ("object", "things", "stuff", "texture")


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * 4)(h)
        h = nn.gelu(h)
        return x + nn.Dense(self.dim)(h)


class CLIPImageTower(nn.Module):
    embed_dim: int = 512
    dim: int = 256
    depth: int = 4
    heads: int = 8
    patch: int = 16

    @nn.compact
    def __call__(self, img):
        """img (B, H, W, 3) -> (B, embed_dim) L2-normalized."""
        B, H, W, _ = img.shape
        p = self.patch
        x = img.reshape(B, H // p, p, W // p, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, p * p * 3)
        x = nn.Dense(self.dim)(x)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], 1)
        pos = self.param("pos", nn.initializers.normal(0.02), (1, x.shape[1], self.dim))
        x = x + pos
        for _ in range(self.depth):
            x = _Block(self.dim, self.heads)(x)
        x = nn.LayerNorm()(x)[:, 0]
        x = nn.Dense(self.embed_dim)(x)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-9)


class CLIPTextTower(nn.Module):
    embed_dim: int = 512
    dim: int = 256
    depth: int = 4
    heads: int = 8
    vocab: int = 4096
    ctx_len: int = 16

    @nn.compact
    def __call__(self, tokens):
        """tokens (B, L) int32 -> (B, embed_dim) L2-normalized."""
        B, L = tokens.shape
        emb = nn.Embed(self.vocab, self.dim)(tokens)
        pos = self.param("pos", nn.initializers.normal(0.02), (1, self.ctx_len, self.dim))
        x = emb + pos[:, :L]
        for _ in range(self.depth):
            x = _Block(self.dim, self.heads)(x)
        x = nn.LayerNorm()(x)[:, -1]  # last token
        x = nn.Dense(self.embed_dim)(x)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-9)


def simple_tokenize(text: str, vocab: int = 4096, ctx_len: int = 16) -> np.ndarray:
    """Deterministic hashing tokenizer (stand-in for the BPE tokenizer;
    replace with vocab-faithful tokens when pretrained weights are loaded)."""
    toks = [hash(w) % (vocab - 2) + 2 for w in text.lower().split()][: ctx_len - 1]
    out = np.zeros(ctx_len, np.int32)
    out[:len(toks)] = toks
    out[len(toks)] = 1  # eot
    return out


class CLIPEncoder:
    """Joint image/text embedding + LERF relevancy."""

    def __init__(self, embed_dim: int = 512, weights_path: Optional[str] = None,
                 seed: int = 0, negatives: Sequence[str] = CANONICAL_NEGATIVES,
                 bpe_path: Optional[str] = None):
        self.embed_dim = embed_dim
        self._vit = None
        self._tokenizer = None
        if weights_path:
            data = np.load(weights_path, allow_pickle=True)
            if "meta" in data.files:
                # imported real CLIP (tools/import_weights.py clip): use the
                # full ViT architecture (clip_vit.py), key-matched weights
                from .clip_vit import BPETokenizer, CLIPViT
                self._vit = CLIPViT.from_npz(weights_path)
                if bpe_path:
                    self._tokenizer = BPETokenizer(bpe_path)
            else:
                self.image_params = jax.tree_util.tree_map(
                    jnp.asarray, data["image"].item())
                self.text_params = jax.tree_util.tree_map(
                    jnp.asarray, data["text"].item())
        if self._vit is None:
            self.image_tower = CLIPImageTower(embed_dim=embed_dim)
            self.text_tower = CLIPTextTower(embed_dim=embed_dim)
            if not hasattr(self, "image_params"):
                k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
                self.image_params = self.image_tower.init(
                    k1, jnp.zeros((1, 64, 64, 3)))
                self.text_params = self.text_tower.init(
                    k2, jnp.zeros((1, 16), jnp.int32))
        self.negatives = list(negatives)
        self.neg_embeds = self.encode_text(self.negatives)
        self.positives: List[str] = []
        self.pos_embeds = None

    def encode_image(self, imgs) -> jnp.ndarray:
        if self._vit is not None:
            return self._vit.encode_image(imgs)
        return self.image_tower.apply(self.image_params, imgs)

    def encode_text(self, texts: Sequence[str]) -> jnp.ndarray:
        if self._vit is not None:
            if self._tokenizer is not None:
                toks = self._tokenizer(list(texts))
            else:
                # no BPE vocab supplied: hash words into the model's vocab
                # space with true SOT/EOT ids (EOT = argmax drives pooling)
                ctx = self._vit.text.ctx_len
                vocab = self._vit.text.vocab_size
                toks = np.zeros((len(texts), ctx), np.int32)
                for i, t in enumerate(texts):
                    ws = [hash(w) % (vocab - 3) + 1
                          for w in t.lower().split()][:ctx - 2]
                    toks[i, 0] = vocab - 2   # <|startoftext|>
                    toks[i, 1:1 + len(ws)] = ws
                    toks[i, 1 + len(ws)] = vocab - 1  # <|endoftext|>
            return self._vit.encode_text(jnp.asarray(toks))
        toks = jnp.asarray(np.stack([simple_tokenize(t) for t in texts]))
        return self.text_tower.apply(self.text_params, toks)

    def set_positives(self, phrases: Sequence[str]):
        self.positives = list(phrases)
        self.pos_embeds = self.encode_text(self.positives)

    def get_relevancy(self, embeds: jnp.ndarray, positive_id: int,
                      temperature: float = 10.0) -> jnp.ndarray:
        """embeds (..., D) -> (..., 2) [pos_prob, neg_prob]: softmax over the
        positive vs EACH negative, min over negatives (LERF relevancy)."""
        pos = self.pos_embeds[positive_id]
        sims_pos = (embeds * pos).sum(-1)                       # (...)
        sims_neg = embeds @ self.neg_embeds.T                   # (..., N)
        pairs = jnp.stack([jnp.broadcast_to(sims_pos[..., None], sims_neg.shape),
                           sims_neg], axis=-1)                  # (..., N, 2)
        probs = jax.nn.softmax(temperature * pairs, axis=-1)    # (..., N, 2)
        best_neg = jnp.argmax(sims_neg, axis=-1)                # most confusing
        out = jnp.take_along_axis(
            probs, best_neg[..., None, None].repeat(2, -1), axis=-2)[..., 0, :]
        return out
