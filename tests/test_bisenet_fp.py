"""Face-parsing BiSeNet: key-matched import + parse_mask category semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.models.parsing.bisenet_fp import BiSeNetFP, FaceParser
from deep3dmap_tpu.utils.torch_import import import_bisenet


def _bn(sd, key, ch, rng):
    sd[f"{key}.weight"] = np.abs(rng.randn(ch)).astype(np.float32) + 0.5
    sd[f"{key}.bias"] = rng.randn(ch).astype(np.float32) * 0.1
    sd[f"{key}.running_mean"] = rng.randn(ch).astype(np.float32) * 0.1
    sd[f"{key}.running_var"] = np.abs(rng.randn(ch)).astype(np.float32) + 0.5


def make_faceparsing_sd(rng, n_classes=19):
    """Synthetic state dict in the face-parsing.PyTorch BiSeNet key layout."""
    sd = {}

    def conv(key, o, i, k):
        sd[f"{key}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05

    conv("cp.resnet.conv1", 64, 3, 7)
    _bn(sd, "cp.resnet.bn1", 64, rng)
    chans = {1: 64, 2: 128, 3: 256, 4: 512}
    for L in (1, 2, 3, 4):
        ch, prev = chans[L], chans.get(L - 1, 64)
        for B in range(2):
            src = f"cp.resnet.layer{L}.{B}"
            cin = prev if (B == 0 and L > 1) else ch
            conv(f"{src}.conv1", ch, cin, 3)
            _bn(sd, f"{src}.bn1", ch, rng)
            conv(f"{src}.conv2", ch, ch, 3)
            _bn(sd, f"{src}.bn2", ch, rng)
            if L > 1 and B == 0:
                conv(f"{src}.downsample.0", ch, prev, 1)
                _bn(sd, f"{src}.downsample.1", ch, rng)
    for arm, cin in (("arm16", 256), ("arm32", 512)):
        conv(f"cp.{arm}.conv.conv", 128, cin, 3)
        _bn(sd, f"cp.{arm}.conv.bn", 128, rng)
        conv(f"cp.{arm}.conv_atten", 128, 128, 1)
        _bn(sd, f"cp.{arm}.bn_atten", 128, rng)
    conv("cp.conv_avg.conv", 128, 512, 1)
    _bn(sd, "cp.conv_avg.bn", 128, rng)
    for head in ("conv_head16", "conv_head32"):
        conv(f"cp.{head}.conv", 128, 128, 3)
        _bn(sd, f"cp.{head}.bn", 128, rng)
    conv("ffm.convblk.conv", 256, 256, 1)
    _bn(sd, "ffm.convblk.bn", 256, rng)
    conv("ffm.conv1", 64, 256, 1)
    conv("ffm.conv2", 256, 64, 1)
    conv("conv_out.conv.conv", 256, 256, 3)
    _bn(sd, "conv_out.conv.bn", 256, rng)
    conv("conv_out.conv_out", n_classes, 256, 1)
    sd["conv_out.conv_out.bias"] = rng.randn(n_classes).astype(np.float32) * 0.1
    # aux heads present in real checkpoints; the importer must ignore them
    conv("conv_out16.conv.conv", 64, 128, 3)
    _bn(sd, "conv_out16.conv.bn", 64, rng)
    conv("conv_out16.conv_out", n_classes, 64, 1)
    return sd


def test_import_and_forward(rng):
    sd = make_faceparsing_sd(rng)
    params = import_bisenet(sd)
    net = BiSeNetFP(n_classes=19)
    out = jax.jit(net.apply)(params, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 19)
    assert bool(np.all(np.isfinite(np.asarray(out))))


def test_bn_folding_matches_torch(rng):
    """Folded conv+BN equals torch's eval-mode conv->BN on a random block."""
    torch = pytest.importorskip("torch")
    conv = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    bn = torch.nn.BatchNorm2d(64).eval()
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.1)
        bn.running_var.uniform_(0.5, 1.5)
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.normal_(0, 0.1)
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref = torch.relu(bn(conv(x))).permute(0, 2, 3, 1).numpy()

    sd = make_faceparsing_sd(rng)
    sd["cp.resnet.conv1.weight"] = conv.weight.detach().numpy()
    for suffix, t in (("weight", bn.weight), ("bias", bn.bias),
                      ("running_mean", bn.running_mean),
                      ("running_var", bn.running_var)):
        sd[f"cp.resnet.bn1.{suffix}"] = t.detach().numpy()
    params = import_bisenet(sd)
    k = params["params"]["resnet"]["conv1"]["kernel"]
    b = params["params"]["resnet"]["conv1"]["bias"]
    got = jax.nn.relu(
        jax.lax.conv_general_dilated(
            jnp.asarray(x.permute(0, 2, 3, 1).numpy()), jnp.asarray(k),
            (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_parse_mask_categories():
    """Category class windows match gan2shape.py:349-362."""
    parser = FaceParser()  # random init: we test the mask mapping directly

    def mask_for(cls_id, category):
        """Uniform class map -> the scalar mask value that class maps to."""
        cm = np.full((1, 8, 8), cls_id, np.int32)
        lg = jax.nn.one_hot(cm, 19) * 10.0
        parser._apply = lambda p, x, lg=lg: jax.image.resize(
            lg, (1, x.shape[1], x.shape[2], 19), "nearest")
        m = np.asarray(parser.parse_mask(jnp.zeros((1, 32, 32, 3)), category,
                                         out_size=8))
        np.testing.assert_allclose(m.min(), m.max(), atol=1e-6)
        return round(float(m.min()), 5)

    # face: (all-classes except 16) averaged with (classes 1..13)
    assert mask_for(0, "face") == 0.0    # background
    assert mask_for(5, "face") == 1.0    # face feature: in both masks
    assert mask_for(16, "face") == 0.0   # cloth: excluded from both
    assert mask_for(17, "face") == 0.5   # hair: all-mask only
    # synface: classes 1..14
    assert mask_for(14, "synface") == 1.0
    assert mask_for(15, "synface") == 0.0

    for cat, cid in (("car", 7), ("cat", 8), ("church", 1), ("horse", 13)):
        cm = np.full((1, 8, 8), cid, np.int32)
        lg = jax.nn.one_hot(cm, 19) * 10.0
        parser._apply = lambda p, x, lg=lg: jax.image.resize(
            lg, (1, x.shape[1], x.shape[2], 19), "nearest")
        m = np.asarray(parser.parse_mask(jnp.zeros((1, 16, 16, 3)), cat,
                                         out_size=4))
        np.testing.assert_allclose(m, 1.0, atol=1e-5)
