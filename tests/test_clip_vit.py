"""Full CLIP (clip_vit.py): key-matched torch import, EOT pooling, tokenizer.

The importer contract: every key of a published OpenAI/OpenCLIP ViT state
dict maps onto our flax tree (utils/torch_import.import_clip).  Tested with
a synthetic tiny checkpoint in the exact torch layout.
"""
import gzip
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.models.modulars.clip_vit import (
    BPETokenizer, CLIPViT, TextTransformer, VisionTransformer, quick_gelu)
from deep3dmap_tpu.utils.torch_import import clip_cfg_from_state_dict, import_clip


def make_torch_clip_sd(rng, width=64, layers=2, patch=8, image=32,
                       twidth=32, tlayers=2, embed=48, vocab=128, ctx=16):
    """Synthetic state dict in the published CLIP ViT key layout."""
    sd = {}
    grid = image // patch

    def blocks(prefix, d, n):
        for i in range(n):
            p = f"{prefix}transformer.resblocks.{i}"
            sd[f"{p}.ln_1.weight"] = rng.randn(d).astype(np.float32)
            sd[f"{p}.ln_1.bias"] = rng.randn(d).astype(np.float32)
            sd[f"{p}.attn.in_proj_weight"] = rng.randn(3 * d, d).astype(np.float32) * 0.05
            sd[f"{p}.attn.in_proj_bias"] = rng.randn(3 * d).astype(np.float32) * 0.05
            sd[f"{p}.attn.out_proj.weight"] = rng.randn(d, d).astype(np.float32) * 0.05
            sd[f"{p}.attn.out_proj.bias"] = rng.randn(d).astype(np.float32) * 0.05
            sd[f"{p}.ln_2.weight"] = rng.randn(d).astype(np.float32)
            sd[f"{p}.ln_2.bias"] = rng.randn(d).astype(np.float32)
            sd[f"{p}.mlp.c_fc.weight"] = rng.randn(4 * d, d).astype(np.float32) * 0.05
            sd[f"{p}.mlp.c_fc.bias"] = rng.randn(4 * d).astype(np.float32) * 0.05
            sd[f"{p}.mlp.c_proj.weight"] = rng.randn(d, 4 * d).astype(np.float32) * 0.05
            sd[f"{p}.mlp.c_proj.bias"] = rng.randn(d).astype(np.float32) * 0.05

    sd["visual.conv1.weight"] = rng.randn(width, 3, patch, patch).astype(np.float32) * 0.05
    sd["visual.class_embedding"] = rng.randn(width).astype(np.float32) * 0.05
    sd["visual.positional_embedding"] = rng.randn(grid * grid + 1, width).astype(np.float32) * 0.05
    sd["visual.ln_pre.weight"] = np.ones(width, np.float32)
    sd["visual.ln_pre.bias"] = np.zeros(width, np.float32)
    blocks("visual.", width, layers)
    sd["visual.ln_post.weight"] = np.ones(width, np.float32)
    sd["visual.ln_post.bias"] = np.zeros(width, np.float32)
    sd["visual.proj"] = rng.randn(width, embed).astype(np.float32) * 0.05

    sd["token_embedding.weight"] = rng.randn(vocab, twidth).astype(np.float32) * 0.05
    sd["positional_embedding"] = rng.randn(ctx, twidth).astype(np.float32) * 0.05
    blocks("", twidth, tlayers)
    sd["ln_final.weight"] = np.ones(twidth, np.float32)
    sd["ln_final.bias"] = np.zeros(twidth, np.float32)
    sd["text_projection"] = rng.randn(twidth, embed).astype(np.float32) * 0.05
    sd["logit_scale"] = np.float32(np.log(100.0))
    return sd


def test_cfg_sniffing(rng):
    sd = make_torch_clip_sd(rng)
    vc, tc = clip_cfg_from_state_dict(sd)
    assert vc == dict(patch=8, width=64, layers=2, heads=1, embed_dim=48,
                      image_size=32)
    assert tc == dict(vocab_size=128, ctx_len=16, width=32, layers=2,
                      heads=1, embed_dim=48)


@pytest.mark.slow
def test_import_and_forward(rng, tmp_path):
    sd = make_torch_clip_sd(rng)
    vc, tc, vp, tp, scale = import_clip(sd)
    assert scale == pytest.approx(100.0, rel=1e-3)
    model = CLIPViT(vc, tc, vision_params=vp, text_params=tp, logit_scale=scale)

    img = rng.rand(2, 32, 32, 3).astype(np.float32)
    z_img = model.encode_image(model.preprocess(img))
    assert z_img.shape == (2, 48)
    np.testing.assert_allclose(np.linalg.norm(z_img, axis=-1), 1.0, atol=1e-4)

    toks = np.zeros((2, 16), np.int32)
    toks[0, :3] = [126, 5, 127]
    toks[1, :4] = [126, 9, 11, 127]
    z_txt = model.encode_text(toks)
    assert z_txt.shape == (2, 48)
    assert bool(np.all(np.isfinite(np.asarray(z_txt))))

    # round-trip via npz (the tools/import_weights.py output format)
    path = os.path.join(tmp_path, "clip.npz")
    np.savez(path,
             vision=np.array(jax.tree_util.tree_map(np.asarray, vp), dtype=object),
             text=np.array(jax.tree_util.tree_map(np.asarray, tp), dtype=object),
             meta=np.array(dict(vision_cfg=vc, text_cfg=tc, logit_scale=scale),
                           dtype=object))
    m2 = CLIPViT.from_npz(path)
    z2 = m2.encode_image(model.preprocess(img))
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z_img), atol=1e-5)


def test_eot_pooling_uses_argmax_token(rng):
    """Text features must be read at the highest-id (EOT) token position."""
    tc = dict(vocab_size=64, ctx_len=8, width=16, layers=1, heads=2, embed_dim=8)
    model = TextTransformer(**tc)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    base = np.array([[5, 9, 63, 0, 0, 0, 0, 0]], np.int32)
    # tokens after EOT must not affect the pooled feature (causal mask +
    # argmax pooling): changing position 4 (> EOT at 2) changes nothing
    mod = base.copy()
    mod[0, 4] = 17
    f1 = model.apply(params, jnp.asarray(base))
    f2 = model.apply(params, jnp.asarray(mod))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)
    # changing a token BEFORE the EOT does change it
    mod2 = base.copy()
    mod2[0, 1] = 17
    f3 = model.apply(params, jnp.asarray(mod2))
    assert not np.allclose(np.asarray(f1), np.asarray(f3), atol=1e-4)


def test_vision_pos_embed_resize(rng):
    """Arbitrary input resolution works via bilinear pos-embed resize."""
    vc = dict(patch=8, width=32, layers=1, heads=2, embed_dim=16, image_size=32)
    model = VisionTransformer(**vc)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = model.apply(params, jnp.zeros((1, 64, 64, 3)))  # 2x the native res
    assert out.shape == (1, 16)
    assert bool(np.all(np.isfinite(np.asarray(out))))


def test_quick_gelu():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(quick_gelu(x)),
        np.asarray(x * jax.nn.sigmoid(1.702 * x)), atol=1e-7)


def _write_tiny_bpe(path):
    """Minimal BPE vocab: merges teaching 'l o w' -> 'low</w>' style tokens."""
    merges = ["#version: 0.2",
              "l o", "lo w</w>", "e r</w>", "lo w", "low e"]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges) + "\n")


def test_bpe_tokenizer(tmp_path):
    path = os.path.join(tmp_path, "bpe.txt.gz")
    _write_tiny_bpe(path)
    tok = BPETokenizer(path, ctx_len=8)
    sot = tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    ids = tok(["low"])
    assert ids.shape == (1, 8)
    assert ids[0, 0] == sot
    # 'low' -> merges (l,o)->lo, (lo,w</w>)->low</w> : a single token
    assert ids[0, 1] == tok.encoder["low</w>"]
    assert ids[0, 2] == eot
    # unknown-but-decomposable word still tokenizes (byte fallback)
    ids2 = tok(["lower"])
    assert ids2[0, 0] == sot and eot in ids2[0]
    # deterministic
    np.testing.assert_array_equal(tok(["low"]), ids)
