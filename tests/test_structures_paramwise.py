"""BaseDataElement structures + paramwise optimizer constructor."""
import numpy as np
import pytest

from deep3dmap_tpu.utils.structures import (BaseDataElement, InstanceData,
                                            PixelData)


def test_base_data_element_meta_vs_data():
    e = BaseDataElement(metainfo=dict(img_shape=(32, 32)), boxes=np.zeros((2, 4)))
    assert e.metainfo_keys() == ["img_shape"]
    assert e.keys() == ["boxes"]
    assert e.img_shape == (32, 32)
    with pytest.raises(AttributeError):
        e.img_shape = (8, 8)  # metainfo immutable via setattr
    e.set_metainfo(dict(img_shape=(8, 8)))
    assert e.img_shape == (8, 8)
    assert "boxes" in e and "missing" not in e
    assert e.pop("boxes").shape == (2, 4)
    assert "boxes" not in e


def test_base_data_element_new_clone():
    e = BaseDataElement(metainfo=dict(scale=2.0), x=np.arange(3.0))
    c = e.clone()
    c.x[0] = 99.0
    assert e.x[0] == 0.0  # deep copy of arrays
    n = e.new(x=np.ones(2))
    assert n.scale == 2.0 and n.x.shape == (2,)
    d = e.to_dict()
    assert set(d) == {"scale", "x"}


def test_base_data_element_jax_numpy_roundtrip():
    import jax.numpy as jnp
    e = BaseDataElement(metainfo=dict(id=1), x=np.arange(4.0))
    j = e.jax()
    assert isinstance(j.x, jnp.ndarray)
    back = j.numpy()
    np.testing.assert_allclose(back.x, e.x)


def test_instance_data_length_check_and_indexing():
    inst = InstanceData(bboxes=np.zeros((3, 4)), labels=np.array([0, 1, 2]))
    assert len(inst) == 3
    with pytest.raises(ValueError):
        inst.scores = np.zeros(2)  # wrong length
    sub = inst[np.array([True, False, True])]
    assert len(sub) == 2 and sub.labels.tolist() == [0, 2]
    one = inst[1:2]
    assert len(one) == 1
    cat = InstanceData.cat([inst, inst])
    assert len(cat) == 6


def test_pixel_data_shape_check():
    pd = PixelData(seg=np.zeros((1, 8, 8)))
    assert pd.shape == (8, 8)
    with pytest.raises(ValueError):
        pd.depth = np.zeros((4, 4))


def test_paramwise_optimizer():
    import jax
    import jax.numpy as jnp
    import optax
    from deep3dmap_tpu.runners.optim import build_optimizer

    params = {
        "Dense_0": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
        "GroupNorm_0": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
    }
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    tx = build_optimizer(
        dict(type="SGD", lr=1.0, weight_decay=0.5),
        paramwise_cfg=dict(custom_keys={"Dense_0": dict(lr_mult=0.1,
                                                        decay_mult=0.0)},
                           bias_lr_mult=2.0, norm_decay_mult=0.0))
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)

    # Dense_0/kernel: lr_mult 0.1, no decay -> -0.1
    np.testing.assert_allclose(updates["Dense_0"]["kernel"], -0.1, rtol=1e-6)
    # GroupNorm params: norm_decay_mult=0 -> update -1.0 (lr_mult 1; bias
    # under a norm marker does NOT get bias_lr_mult)
    np.testing.assert_allclose(updates["GroupNorm_0"]["scale"], -1.0, rtol=1e-6)
    np.testing.assert_allclose(updates["GroupNorm_0"]["bias"], -1.0, rtol=1e-6)


def test_paramwise_bias_mults():
    import jax
    import jax.numpy as jnp
    from deep3dmap_tpu.runners.optim import build_optimizer

    params = {"Conv_0": {"kernel": jnp.ones((2,)), "bias": jnp.ones((2,))}}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    tx = build_optimizer(dict(type="SGD", lr=1.0, weight_decay=0.5),
                         paramwise_cfg=dict(bias_lr_mult=2.0,
                                            bias_decay_mult=0.0))
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # kernel: grad 1 + 0.5 decay -> -1.5; bias: grad 1, no decay, lr x2 -> -2
    np.testing.assert_allclose(updates["Conv_0"]["kernel"], -1.5, rtol=1e-6)
    np.testing.assert_allclose(updates["Conv_0"]["bias"], -2.0, rtol=1e-6)
