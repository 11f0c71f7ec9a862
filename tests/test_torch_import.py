"""Torch->flax weight importer: shape-exact mapping onto our param trees."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.models.modulars.stylegan2 import Generator, StyleDiscriminator
from deep3dmap_tpu.models.losses.perceptual_loss import _VGGFeatures
from deep3dmap_tpu.utils.torch_import import (
    conv_kernel, fill_like, import_stylegan2_discriminator,
    import_stylegan2_generator, import_vgg16_features, linear_kernel)

SIZE, STYLE, NMLP, CM = 32, 64, 2, 1
CH = 512  # all resolutions <=32 use 512 channels


def _rand(rs, *shape):
    return rs.normal(size=shape).astype(np.float32) * 0.05


def _styled_conv_sd(rs, prefix, cin, cout, k, sd):
    sd[f"{prefix}.conv.weight"] = _rand(rs, 1, cout, cin, k, k)
    sd[f"{prefix}.conv.modulation.weight"] = _rand(rs, cin, STYLE)
    sd[f"{prefix}.conv.modulation.bias"] = 1.0 + _rand(rs, cin)
    sd[f"{prefix}.noise.weight"] = _rand(rs, 1)
    sd[f"{prefix}.activate.bias"] = _rand(rs, cout)


def _to_rgb_sd(rs, prefix, cin, sd):
    sd[f"{prefix}.conv.weight"] = _rand(rs, 1, 3, cin, 1, 1)
    sd[f"{prefix}.conv.modulation.weight"] = _rand(rs, cin, STYLE)
    sd[f"{prefix}.conv.modulation.bias"] = 1.0 + _rand(rs, cin)
    sd[f"{prefix}.bias"] = _rand(rs, 1, 3, 1, 1)


def make_generator_sd(rs):
    sd = {}
    for i in range(NMLP):
        sd[f"style.{i + 1}.weight"] = _rand(rs, STYLE, STYLE)
        sd[f"style.{i + 1}.bias"] = _rand(rs, STYLE)
    sd["input.input"] = _rand(rs, 1, CH, 4, 4)
    _styled_conv_sd(rs, "conv1", CH, CH, 3, sd)
    _to_rgb_sd(rs, "to_rgb1", CH, sd)
    log_size = int(math.log2(SIZE))
    for j in range(log_size - 2):
        _styled_conv_sd(rs, f"convs.{2 * j}", CH, CH, 3, sd)
        _styled_conv_sd(rs, f"convs.{2 * j + 1}", CH, CH, 3, sd)
        _to_rgb_sd(rs, f"to_rgbs.{j}", CH, sd)
    return sd


def make_discriminator_sd(rs):
    sd = {}
    sd["convs.0.0.weight"] = _rand(rs, CH, 3, 1, 1)
    sd["convs.0.1.bias"] = _rand(rs, CH)
    log_size = int(math.log2(SIZE))
    for i in range(1, log_size - 1):
        sd[f"convs.{i}.conv1.0.weight"] = _rand(rs, CH, CH, 3, 3)
        sd[f"convs.{i}.conv1.1.bias"] = _rand(rs, CH)
        sd[f"convs.{i}.conv2.1.weight"] = _rand(rs, CH, CH, 3, 3)
        sd[f"convs.{i}.conv2.2.bias"] = _rand(rs, CH)
        sd[f"convs.{i}.skip.1.weight"] = _rand(rs, CH, CH, 1, 1)
    sd["final_conv.0.weight"] = _rand(rs, CH, CH + 1, 3, 3)
    sd["final_conv.1.bias"] = _rand(rs, CH)
    sd["final_linear.0.weight"] = _rand(rs, CH, CH * 16)
    sd["final_linear.0.bias"] = _rand(rs, CH)
    sd["final_linear.1.weight"] = _rand(rs, 1, CH)
    sd["final_linear.1.bias"] = _rand(rs, 1)
    return sd


def test_conv_linear_kernel_transforms():
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)
    hwio = conv_kernel(w)
    assert hwio.shape == (2, 2, 3, 2)
    assert hwio[0, 1, 2, 1] == w[1, 2, 0, 1]
    lw = linear_kernel(np.arange(6, dtype=np.float32).reshape(2, 3))
    assert lw.shape == (3, 2)


def test_import_generator_runs():
    rs = np.random.default_rng(0)
    sd = make_generator_sd(rs)
    flat = import_stylegan2_generator(sd, size=SIZE, n_mlp=NMLP)

    g = Generator(size=SIZE, style_dim=STYLE, n_mlp=NMLP, channel_multiplier=CM)
    z = jnp.zeros((1, STYLE))
    template = jax.jit(lambda k: g.init({"params": k, "noise": k}, z))(
        jax.random.PRNGKey(0))
    params = fill_like(template, flat)

    # mapped leaves end up in the right place
    mapped = np.asarray(params["params"]["mapping"]["dense_0"]["weight"])
    np.testing.assert_allclose(mapped, sd["style.1.weight"].T)
    const = np.asarray(params["params"]["input_const"])
    np.testing.assert_allclose(const, sd["input.input"].transpose(0, 2, 3, 1))

    img = g.apply(params, jnp.asarray(rs.normal(size=(2, STYLE)), jnp.float32),
                  rngs={"noise": jax.random.PRNGKey(1)})
    assert img.shape == (2, SIZE, SIZE, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_import_generator_missing_key_raises():
    rs = np.random.default_rng(0)
    sd = make_generator_sd(rs)
    del sd["conv1.noise.weight"]
    with pytest.raises(KeyError):
        import_stylegan2_generator(sd, size=SIZE, n_mlp=NMLP)


def test_import_discriminator_runs():
    rs = np.random.default_rng(1)
    sd = make_discriminator_sd(rs)
    flat = import_stylegan2_discriminator(sd, size=SIZE, channel_multiplier=CM)

    d = StyleDiscriminator(size=SIZE, channel_multiplier=CM)
    x = jnp.zeros((2, SIZE, SIZE, 3))
    template = jax.jit(lambda k: d.init(k, x))(jax.random.PRNGKey(0))
    params = fill_like(template, flat)
    score = d.apply(params, jnp.asarray(
        np.random.default_rng(2).normal(size=(2, SIZE, SIZE, 3)), jnp.float32))
    assert score.shape == (2, 1)
    assert np.isfinite(np.asarray(score)).all()


def test_import_discriminator_flatten_permutation():
    """The CHW->HWC flatten permutation must preserve the linear map."""
    rs = np.random.default_rng(3)
    sd = make_discriminator_sd(rs)
    flat = import_stylegan2_discriminator(sd, size=SIZE, channel_multiplier=CM)
    w_t = sd["final_linear.0.weight"]  # (O, C*16) over torch (C,4,4) flatten
    w_f = flat["params/final_dense/weight"]  # (16*C, O) over (4,4,C) flatten
    feat = rs.normal(size=(CH, 4, 4)).astype(np.float32)
    y_torch = w_t @ feat.reshape(-1)
    y_flax = feat.transpose(1, 2, 0).reshape(-1) @ w_f
    np.testing.assert_allclose(y_torch, y_flax, rtol=1e-4, atol=1e-5)


def _torch_mnasnet_trunk(rs):
    """torchvision-mnasnet-shaped trunk (layers 0-10, alpha=1) with random
    weights AND random BN running stats, eval mode."""
    torch = pytest.importorskip("torch")
    tnn = torch.nn

    class _IR(tnn.Module):
        def __init__(self, cin, cout, k, s, exp):
            super().__init__()
            mid = cin * exp
            self.layers = tnn.Sequential(
                tnn.Conv2d(cin, mid, 1, bias=False), tnn.BatchNorm2d(mid),
                tnn.ReLU(), tnn.Conv2d(mid, mid, k, padding=k // 2, stride=s,
                                       groups=mid, bias=False),
                tnn.BatchNorm2d(mid), tnn.ReLU(),
                tnn.Conv2d(mid, cout, 1, bias=False), tnn.BatchNorm2d(cout))
            self.apply_residual = cin == cout and s == 1

        def forward(self, x):
            y = self.layers(x)
            return x + y if self.apply_residual else y

    def _stack(cin, cout, k, s, exp, repeats):
        blocks = [_IR(cin, cout, k, s, exp)]
        blocks += [_IR(cout, cout, k, 1, exp) for _ in range(repeats - 1)]
        return tnn.Sequential(*blocks)

    trunk = tnn.Module()
    trunk.layers = tnn.Sequential(
        tnn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
        tnn.BatchNorm2d(32), tnn.ReLU(),
        tnn.Conv2d(32, 32, 3, padding=1, groups=32, bias=False),
        tnn.BatchNorm2d(32), tnn.ReLU(),
        tnn.Conv2d(32, 16, 1, bias=False), tnn.BatchNorm2d(16),
        _stack(16, 24, 3, 2, 3, 3), _stack(24, 40, 5, 2, 3, 3),
        _stack(40, 80, 5, 2, 6, 3))
    with torch.no_grad():
        for p in trunk.parameters():
            p.copy_(torch.from_numpy(
                rs.normal(size=tuple(p.shape)).astype(np.float32) * 0.1))
        for m in trunk.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rs.normal(size=tuple(m.running_mean.shape)).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rs.uniform(0.5, 2.0, size=tuple(m.running_var.shape)).astype(np.float32)))
    trunk.eval()
    return torch, trunk


@pytest.mark.slow
def test_import_mnasnet_trunk_forward_parity():
    """BN folding + torch padding reproduce the torch trunk stage-by-stage."""
    from deep3dmap_tpu.models.backbones.fpn2d import MnasFPN
    from deep3dmap_tpu.utils.torch_import import import_mnasnet_trunk

    rs = np.random.default_rng(7)
    torch, trunk = _torch_mnasnet_trunk(rs)
    sd = {k: v.numpy() for k, v in trunk.state_dict().items()}

    x = rs.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        h = trunk.layers[:8](torch.from_numpy(x))
        c0 = trunk.layers[8](h)
        c1 = trunk.layers[9](c0)
        c2 = trunk.layers[10](c1)

    mnas = MnasFPN(alpha=1.0, norm="none", torch_pad=True)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = jax.jit(mnas.init)(jax.random.PRNGKey(0), x_nhwc)
    params = import_mnasnet_trunk(sd, template)
    outs, inter = mnas.apply(params, x_nhwc, capture_intermediates=True)
    stages = inter["intermediates"]
    for name, ref in (("_Stack_0", c0), ("_Stack_1", c1), ("_Stack_2", c2)):
        got = np.asarray(stages[name]["__call__"][0])
        np.testing.assert_allclose(got, ref.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-3, atol=1e-4)
    # FPN heads still produce the 3-scale pyramid on imported weights
    assert [o.shape[-1] for o in outs] == [24, 40, 80]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


@pytest.mark.slow
def test_import_mnasnet_rejects_bad_shape():
    from deep3dmap_tpu.models.backbones.fpn2d import MnasFPN
    from deep3dmap_tpu.utils.torch_import import import_mnasnet_trunk

    rs = np.random.default_rng(8)
    _, trunk = _torch_mnasnet_trunk(rs)
    sd = {k: v.numpy() for k, v in trunk.state_dict().items()}
    sd["layers.0.weight"] = sd["layers.0.weight"][:, :, :1, :1]  # wrong kernel
    mnas = MnasFPN(alpha=1.0, norm="none", torch_pad=True)
    template = jax.jit(mnas.init)(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    with pytest.raises(ValueError):
        import_mnasnet_trunk(sd, template)


def test_import_vgg16_features():
    rs = np.random.default_rng(4)
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
             (512, 512), (512, 512)]
    idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    sd = {}
    for (cin, cout), i in zip(chans, idx):
        sd[f"features.{i}.weight"] = _rand(rs, cout, cin, 3, 3)
        sd[f"features.{i}.bias"] = _rand(rs, cout)
    flat = import_vgg16_features(sd)

    net = _VGGFeatures()
    template = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = fill_like(template, flat)
    feats = net.apply(params, jnp.zeros((1, 32, 32, 3)))
    assert len(feats) == 5
