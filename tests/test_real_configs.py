"""Real-data configs reach the first optimizer step from fixture dirs
(VERDICT r2 next #8): tools/train.py <cfg> with --cfg-options pointing the
dataset at a tiny generated fixture + scaled-down model.
"""
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _write_png(path, arr):
    import cv2

    cv2.imwrite(str(path), arr[:, :, ::-1])


def _run_train(cfg, tmp_path, options, max_epochs="1"):
    env = dict(os.environ)
    # the axon TPU plugin ignores JAX_PLATFORMS; tools/train.py honors
    # D3M_PLATFORM via maybe_force_platform() before backends initialize
    env["D3M_PLATFORM"] = "cpu"
    from deep3dmap_tpu.utils.misc import machine_cache_dir
    env["JAX_COMPILATION_CACHE_DIR"] = machine_cache_dir("/tmp/jax_test_cache")
    env.pop("XLA_FLAGS", None)
    cmd = [sys.executable, osp.join(REPO, "tools", "train.py"),
           osp.join(REPO, cfg), "--work-dir", str(tmp_path / "work"),
           "--max-epochs", max_epochs, "--no-validate",
           "--cfg-options"] + options
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=900, cwd=REPO)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    log = (tmp_path / "work" / "train.log").read_text()
    return log


def _blender_fixture(root, n=3, s=16):
    (root / "train").mkdir(parents=True)
    rs = np.random.RandomState(0)
    frames = []
    for i in range(n):
        _write_png(root / "train" / f"r_{i}.png",
                   (rs.rand(s, s, 3) * 255).astype(np.uint8))
        pose = np.eye(4)
        pose[0, 3] = 2.0 + 0.1 * i
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": pose.tolist()})
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.69, "frames": frames}, f)


@pytest.mark.slow
def test_prnet_300wlp_config_first_step(tmp_path):
    sys.path.insert(0, osp.join(REPO, "tools", "data_gen"))
    from prnet import GeneratePos

    S = 32
    gp = GeneratePos(S, S, synthetic=True, seed=0)
    gp.write_uv_kpt_ind(str(tmp_path))
    rs = np.random.RandomState(0)
    names = []
    import cv2
    for i in range(4):
        img = rs.rand(48, 48, 3)
        pose = np.array([0.0, 0.1, 0.0, 24.0, 24.0, 0.0, 0.02])
        cropped, uv = gp.process_arrays(img, pose,
                                        rs.randn(gp.w_shape.shape[1]) * 0.3,
                                        rs.randn(gp.w_exp.shape[1]) * 0.3)
        cv2.imwrite(str(tmp_path / f"im{i}_inp.jpg"),
                    np.rint(cropped[:, :, ::-1] * 255))
        np.save(tmp_path / f"im{i}.npy", uv)
        names.append(f"im{i}.jpg")
    (tmp_path / "list.txt").write_text("\n".join(names) + "\n")

    log = _run_train(
        "configs/prnet/prnet_300wlp.py", tmp_path,
        [f"data.train.datapath={tmp_path}/list.txt",
         f"data.train.img_prefix={tmp_path}",
         "data.train.resolution=32",
         f"data.train.uv_kpt_ind_file={tmp_path}/uv_kpt_ind.txt",
         "data.samples_per_gpu=2",
         "model.model_cfgs.resolution=32",
         "model.model_cfgs.base_channels=4",
         f"model.model_cfgs.uv_kpt_ind_file={tmp_path}/uv_kpt_ind.txt"])
    assert "Epoch [1]" in log


@pytest.mark.slow
def test_gan2shape_celeba_config_first_step(tmp_path):
    img_root = tmp_path / "images"
    lat_root = tmp_path / "latents"
    img_root.mkdir()
    lat_root.mkdir()
    rs = np.random.RandomState(2)
    names = []
    for i in range(2):
        name = f"face_{i}.png"
        _write_png(img_root / name, (rs.rand(32, 32, 3) * 255).astype(np.uint8))
        np.save(lat_root / f"face_{i}.npy", rs.randn(32).astype(np.float32))
        names.append(name)
    (tmp_path / "list.txt").write_text("\n".join(names) + "\n")

    log = _run_train(
        "configs/gan2shape/celeba.py", tmp_path,
        [f"data.train.img_list_path={tmp_path}/list.txt",
         f"data.train.img_root={img_root}",
         f"data.train.latent_root={lat_root}",
         "data.train.image_size=32",
         f"data.test.img_list_path={tmp_path}/list.txt",
         f"data.test.img_root={img_root}",
         f"data.test.latent_root={lat_root}",
         "data.test.image_size=32",
         "model.model_cfgs.image_size=32", "model.model_cfgs.gan_size=32",
         "model.model_cfgs.z_dim=32", "model.model_cfgs.n_mlp=2",
         "model.model_cfgs.nf=4", "model.model_cfgs.batchsize=2",
         "model.model_cfgs.gan_ckpt=None",
         "model.model_cfgs.parsing_ckpt=None",
         "model.model_cfgs.use_mask=False",
         "runner.stage_iters=(1,1,1)", "runner.num_stage=1"])
    assert "step" in log.lower() or "Epoch" in log


@pytest.mark.slow
def test_gnerf_blender_config_first_step(tmp_path):
    _blender_fixture(tmp_path / "lego")
    log = _run_train(
        "configs/gnerf/blender.py", tmp_path,
        [f"data.train.data_dir={tmp_path}/lego",
         "data.train.img_wh=(16,16)",
         "data.val.type=SyntheticNerfDataset",
         "data.test.type=SyntheticNerfDataset",
         "model.model_cfgs.img_wh=(16,16)", "model.model_cfgs.patch_size=16",
         "model.model_cfgs.inv_size=16", "model.model_cfgs.fc_depth=2",
         "model.model_cfgs.fc_dim=16", "model.model_cfgs.N_samples=4",
         "model.model_cfgs.N_importance=4", "model.model_cfgs.ndf=8",
         "model.model_cfgs.inv_depth=2",
         "runner.state_steps=[0,1,2]",
         "workflow=[('train',1)]"])
    assert "Epoch [1]" in log


@pytest.mark.slow
def test_lerf_config_first_step(tmp_path):
    _blender_fixture(tmp_path / "lego")
    log = _run_train(
        "configs/lerf/lerf.py", tmp_path,
        [f"data.train.image_dataset.data_dir={tmp_path}/lego",
         "data.train.image_dataset.img_wh=(16,16)",
         "data.train.rays_per_batch=32", "data.train.n_batches=2",
         "data.train.clip_n_dims=16", "data.train.dino_n_dims=16",
         "data.train.tile_size_res=2", "data.train.tile_size_range=(0.3,0.6)",
         "data.train.clip_npz=None", "data.train.dino_npz=None",
         "model.model_cfgs.clip_n_dims=16", "model.model_cfgs.dino_n_dims=16",
         "model.model_cfgs.N_proposal=8", "model.model_cfgs.N_importance=8",
         "model.model_cfgs.rgb_grid_levels=2", "model.model_cfgs.rgb_grid_log2=8",
         "model.model_cfgs.rgb_grid_end=32", "model.model_cfgs.rgb_hidden=16",
         "model.model_cfgs.num_lerf_samples=4",
         "model.model_cfgs.clip_weights=None",
         "model.model_cfgs.grid_layers=(2,)", "model.model_cfgs.grid_sizes=(8,)",
         "model.model_cfgs.grid_resolutions=((8,16),)",
         "model.model_cfgs.hidden=16",
         "runner.runner_cfgs.max_iters=2"],
        max_epochs="1")
    assert "Iter" in log or "iter" in log


@pytest.mark.slow
def test_gnerf_dtu_config_first_step(tmp_path):
    scan = tmp_path / "Rectified" / "scan1"
    scan.mkdir(parents=True)
    cams = tmp_path / "Cameras" / "train"
    cams.mkdir(parents=True)
    rs = np.random.RandomState(1)
    for i in range(9):
        _write_png(scan / f"rect_{i + 1:03d}_3_r5000.png",
                   (rs.rand(12, 16, 3) * 255).astype(np.uint8))
        E = np.eye(4)
        E[:3, 3] = [0, 0, i + 1]
        K = np.array([[100.0, 0, 8], [0, 100.0, 6], [0, 0, 1]])
        with open(cams / f"{i:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in E:
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("\nintrinsic\n")
            for row in K:
                f.write(" ".join(str(v) for v in row) + "\n")
    log = _run_train(
        "configs/gnerf/dtu.py", tmp_path,
        [f"data.train.data_dir={scan}",
         "data.train.img_wh=(16,12)",
         "data.val.type=SyntheticNerfDataset",
         "data.test.type=SyntheticNerfDataset",
         "model.model_cfgs.img_wh=(16,12)", "model.model_cfgs.patch_size=16",
         "model.model_cfgs.inv_size=16", "model.model_cfgs.fc_depth=2",
         "model.model_cfgs.fc_dim=16", "model.model_cfgs.N_samples=4",
         "model.model_cfgs.N_importance=4", "model.model_cfgs.ndf=8",
         "model.model_cfgs.inv_depth=2",
         "runner.state_steps=[0,1,2]",
         "workflow=[('train',1)]"])
    assert "Epoch [1]" in log


def _multipie_fixture(root, n_ids=3, n_views=4, s=48, n_verts=256):
    """Tiny MultiPIE layout matching tools/data_gen/multipie.py organize."""
    import pickle

    img_root = root / "images"
    obj_root = root / "objs"
    img_root.mkdir(parents=True)
    obj_root.mkdir()
    rs = np.random.RandomState(0)
    uvtex2poseimgs, aux = {}, {}
    poses = ["05_1", "14_0", "13_0", "04_1"]
    for i in range(n_ids):
        key = f"{i + 1:03d}_01_01"
        uvtex = f"{key}.npy"
        pose2imgs = {}
        for v in range(n_views):
            name = f"{key}_{poses[v]}_10.png"
            _write_png(img_root / name,
                       (rs.rand(s, s, 3) * 255).astype(np.uint8))
            pose2imgs.setdefault(poses[v], []).append(name)
            ang = rs.uniform(-0.3, 0.3, 3)
            from deep3dmap_tpu.core.all3dtrans.rotations import (
                euler_angles_to_matrix)
            R = np.asarray(euler_angles_to_matrix(ang.astype(np.float32),
                                                  "XYZ"), np.float64)
            aux[name] = {
                "lm68": (rs.rand(68, 2) * s).astype(np.float32),
                "s": float(1e-3 + rs.rand() * 1e-3),
                "R": R,
                "t": rs.uniform(0.2 * s, 0.8 * s, 3).astype(np.float64),
            }
        uvtex2poseimgs[uvtex] = pose2imgs
        verts = rs.randn(n_verts, 3) * 0.1
        with open(obj_root / f"{key}.obj", "w") as f:
            for v3 in verts:
                f.write(f"v {v3[0]:.5f} {v3[1]:.5f} {v3[2]:.5f}\n")
    with open(root / "multipie_uvtex2poseimgs.pkl", "wb") as f:
        pickle.dump(uvtex2poseimgs, f)
    with open(root / "multipie_imgpath2auxinfo.pkl", "wb") as f:
        pickle.dump(aux, f)


@pytest.mark.slow
def test_imgs2mesh_multipie_config_first_step(tmp_path):
    """imgs2mesh real-data binding (VERDICT r3 Missing #2): the MultiPIE
    config reaches the first optimizer step from a generated fixture."""
    root = tmp_path / "multipie"
    _multipie_fixture(root)

    log = _run_train(
        "configs/pt3d_demos/imgs2face_multipie.py", tmp_path,
        [f"data.train.datadir={root}",
         f"data.train.imgdir={root}/images",
         f"data.train.objroot={root}/objs",
         "data.train.tuplesize=2", "data.train.image_size=32",
         f"data.test.datadir={root}",
         f"data.test.imgdir={root}/images",
         f"data.test.objroot={root}/objs",
         "data.test.tuplesize=2", "data.test.image_size=32",
         "data.samples_per_gpu=2",
         "model.model_cfgs.tuplesize=2",
         "model.model_cfgs.image_size=32",
         "model.model_cfgs.n_verts=256",
         "model.model_cfgs.use_sampling=False",
         "runner.state_steps=[0,2]"],
        max_epochs="2")
    assert "Epoch" in log or "state" in log.lower()
