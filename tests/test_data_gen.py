"""Face data-gen tools round-trip (VERDICT r2 next #7).

prnet: synthetic-BFM generate -> 300WLP folder layout -> train FaceImg2UV a
few steps -> NME improves.  multipie: organize builds the pkl indexes.
"""
import os.path as osp
import pickle
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools", "data_gen"))


@pytest.mark.slow
def test_prnet_datagen_roundtrip_nme_improves(tmp_path):
    import cv2

    from prnet import GeneratePos

    S = 64
    gp = GeneratePos(S, S, synthetic=True, seed=0)
    gp.write_uv_kpt_ind(str(tmp_path))
    ind = np.loadtxt(tmp_path / "uv_kpt_ind.txt").astype(np.int64)
    assert ind.shape == (2, 68)
    assert (ind >= 0).all() and (ind < S).all()

    rs = np.random.RandomState(0)
    names = []
    for i in range(4):
        img = rs.rand(96, 96, 3).astype(np.float64)
        pose = np.array([0.1 * rs.randn(), 0.2 * rs.randn(), 0.1 * rs.randn(),
                         48.0, 48.0, 0.0, 0.02], np.float64)
        shape_para = rs.randn(gp.w_shape.shape[1]) * 0.5
        exp_para = rs.randn(gp.w_exp.shape[1]) * 0.5
        cropped, uv_pos = gp.process_arrays(img, pose, shape_para, exp_para)
        assert cropped.shape == (S, S, 3)
        assert uv_pos.shape == (S, S, 3)
        assert np.isfinite(uv_pos).all()
        name = f"im{i}"
        cv2.imwrite(str(tmp_path / f"{name}_inp.jpg"),
                    np.rint(cropped[:, :, ::-1] * 255))
        np.save(tmp_path / f"{name}.npy", uv_pos)
        names.append(f"{name}.jpg")
    with open(tmp_path / "list.txt", "w") as f:
        f.write("\n".join(names) + "\n")

    # the generated uv map must actually cover texels (mesh rasterized)
    assert (np.abs(uv_pos).sum(-1) > 0).mean() > 0.2

    from deep3dmap_tpu.datasets.builder import build_dataset
    from deep3dmap_tpu.models.frameworks.prnet import FaceImg2UV

    ds = build_dataset(dict(type="ThreeHundredWLPDataset",
                            datapath=str(tmp_path / "list.txt"),
                            img_prefix=str(tmp_path), resolution=S,
                            uv_kpt_ind_file=str(tmp_path / "uv_kpt_ind.txt")))
    assert len(ds) == 4

    fw = FaceImg2UV(dict(resolution=S, base_channels=8,
                         uv_kpt_ind_file=str(tmp_path / "uv_kpt_ind.txt")))
    items = [ds[i] for i in range(4)]
    batch = {k: jnp.asarray(np.stack([it[k] for it in items]))
             for k in ("faceimg", "gt_uvimg")}
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)

    def eval_nme_now(params):
        out, _ = fw.forward_test(params, mstate, batch)
        kpts = [np.asarray(out["kpt"][i:i + 1]) for i in range(4)]
        return ds.evaluate({"kpt": kpts})["nme"]

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def step(carry, rng):
        params, opt = carry
        (loss, aux), g = jax.value_and_grad(fw.loss_fn, has_aux=True)(
            params, mstate, batch, rng)
        u, opt = tx.update(g, opt, params)
        return (optax.apply_updates(params, u), opt), loss

    nme0 = eval_nme_now(params)
    keys = jax.random.split(jax.random.PRNGKey(1), 80)
    (params2, _), losses = jax.jit(
        lambda c, ks: jax.lax.scan(step, c, ks))((params, opt), keys)
    assert np.isfinite(np.asarray(losses)).all()
    nme1 = eval_nme_now(params2)
    assert nme1 < 0.7 * nme0, f"NME {nme0:.4f} -> {nme1:.4f}"


def test_multipie_organize_builds_indexes(tmp_path):
    from multipie import cmd_organize

    labels = tmp_path / "labels.txt"
    lines = []
    for idx in range(3):
        for pose in (6, 7):
            for illum in ("10", "04"):
                name = f"{idx + 1:03d}_01_01_051_{illum}.png"
                lines.append(f"imgs/{name} {idx} {pose}")
    labels.write_text("\n".join(lines) + "\n")

    uvtex = tmp_path / "uvtex.txt"
    uvtex.write_text("\n".join(f"uv/{i + 1:03d}_01_01.png" for i in range(3)) + "\n")

    class A:
        pass

    a = A()
    a.labels = str(labels)
    a.root = str(tmp_path)
    a.out = str(tmp_path / "out")
    a.uvtex_list = str(uvtex)
    a.obj_list = None
    a.obj_root = ""
    a.model_shape = None
    a.fan_weights = None
    cmd_organize(a)

    with open(tmp_path / "out" / "multipie_idillumexp2poseimgpaths.pkl", "rb") as f:
        index = pickle.load(f)
    assert set(index) == {0, 1, 2}
    assert set(index[0]) == {"10", "04"}
    assert set(index[0]["10"]["neutral"]) == {"05_1", "05_0"}

    with open(tmp_path / "out" / "multipie_uvtex2poseimgs.pkl", "rb") as f:
        uvmap = pickle.load(f)
    # id parsed as int(name)-1 -> ids 0..2, illum-10 buckets exist for all
    assert len(uvmap) == 3
