"""Real-file dataset readers against tiny generated on-disk fixtures."""
import json
import os

import numpy as np
import pytest

from deep3dmap_tpu.datasets import build_dataset


def _write_png(path, arr):
    import cv2
    cv2.imwrite(str(path), arr[..., ::-1])  # RGB -> BGR


def test_blender_dataset(tmp_path):
    (tmp_path / "train").mkdir()
    rs = np.random.RandomState(0)
    frames = []
    for i in range(3):
        img = (rs.rand(8, 8, 3) * 255).astype(np.uint8)
        _write_png(tmp_path / "train" / f"r_{i}.png", img)
        pose = np.eye(4)
        pose[0, 3] = i
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": pose.tolist()})
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)

    ds = build_dataset(dict(type="BlenderDataset", data_dir=str(tmp_path),
                            split="train", img_wh=(8, 8)))
    assert len(ds) == 3
    assert ds.poses.shape == (3, 3, 4)
    assert ds.intrinsics.shape == (3, 3)
    # focal from camera_angle_x at the scaled resolution
    focal = 0.5 * 8 / np.tan(0.5 * 0.6911)
    assert np.isclose(ds.intrinsics[0, 0], focal, rtol=1e-5)
    item = ds[1]
    assert item["imgs"].shape == (8, 8, 3)
    assert item["imgs"].min() >= -1.0 and item["imgs"].max() <= 1.0
    assert int(item["img_idx"]) == 1


def test_blender_aspect_ratio_guard(tmp_path):
    (tmp_path / "train").mkdir()
    _write_png(tmp_path / "train" / "r_0.png", np.zeros((8, 16, 3), np.uint8))
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.7,
                   "frames": [{"transform_matrix": np.eye(4).tolist()}]}, f)
    with pytest.raises(ValueError):
        build_dataset(dict(type="BlenderDataset", data_dir=str(tmp_path),
                           split="train", img_wh=(8, 8)))


def test_dtu_dataset(tmp_path):
    scan = tmp_path / "Rectified" / "scan1"
    scan.mkdir(parents=True)
    cams = tmp_path / "Cameras" / "train"
    cams.mkdir(parents=True)
    rs = np.random.RandomState(1)
    n = 9  # 8 train + 1 val (index 7)
    for i in range(n):
        img = (rs.rand(6, 8, 3) * 255).astype(np.uint8)
        _write_png(scan / f"rect_{i + 1:03d}_3_r5000.png", img)
        E = np.eye(4)
        E[:3, 3] = [0, 0, i + 1]
        K = np.array([[100.0, 0, 4], [0, 100.0, 3], [0, 0, 1]])
        with open(cams / f"{i:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in E:
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("\nintrinsic\n")
            for row in K:
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("\n")

    train = build_dataset(dict(type="DTUDataset", data_dir=str(scan),
                               split="train", img_wh=(8, 6)))
    val = build_dataset(dict(type="DTUDataset", data_dir=str(scan),
                             split="val", img_wh=(8, 6)))
    assert len(train) == 8 and len(val) == 1
    assert train.poses.shape == (8, 3, 4)
    # extrinsic inverted and translation rescaled by 200
    assert np.isclose(train.poses[0, 2, 3], -1 / 200.0)
    # intrinsics x4 then rescaled to img_wh (same here)
    assert np.isclose(train.intrinsics[0, 0], 400.0)
    assert train[0]["imgs"].shape == (6, 8, 3)


def test_celeba_dataset(tmp_path):
    img_root = tmp_path / "image"
    lat_root = tmp_path / "latents"
    img_root.mkdir()
    lat_root.mkdir()
    rs = np.random.RandomState(2)
    names = []
    for i in range(2):
        name = f"face_{i}.png"
        _write_png(img_root / name, (rs.rand(16, 16, 3) * 255).astype(np.uint8))
        np.save(lat_root / f"face_{i}.npy", rs.randn(512).astype(np.float32))
        names.append(name)
    with open(tmp_path / "list.txt", "w") as f:
        f.write("\n".join(names) + "\n")

    ds = build_dataset(dict(type="CelebaDataset",
                            img_list_path=str(tmp_path / "list.txt"),
                            img_root=str(img_root),
                            latent_root=str(lat_root), image_size=8))
    assert len(ds) == 2
    batch = ds.setup_input(0)
    assert batch["input_im"].shape == (1, 8, 8, 3)
    assert batch["latent_w"].shape == (1, 512)
    assert batch["input_im"].min() >= -1.0 and batch["input_im"].max() <= 1.0


def test_celeba_torch_latents(tmp_path):
    import torch
    img_root = tmp_path / "image"
    lat_root = tmp_path / "latents"
    img_root.mkdir()
    lat_root.mkdir()
    _write_png(img_root / "a.png", np.zeros((8, 8, 3), np.uint8))
    torch.save(torch.ones(4), lat_root / "a.pt")
    with open(tmp_path / "list.txt", "w") as f:
        f.write("a.png\n")
    ds = build_dataset(dict(type="CelebaDataset",
                            img_list_path=str(tmp_path / "list.txt"),
                            img_root=str(img_root),
                            latent_root=str(lat_root), image_size=8))
    np.testing.assert_allclose(ds[0]["latent_w"], np.ones(4))


def test_300wlp_dataset(tmp_path):
    rs = np.random.RandomState(3)
    S = 32
    names = []
    for i in range(2):
        base = f"img_{i}"
        img = (rs.rand(S, S, 3) * 255).astype(np.uint8)
        _write_png(tmp_path / f"{base}_inp.jpg", img)
        np.save(tmp_path / f"{base}.npy",
                rs.rand(S, S, 3).astype(np.float32) * (S - 1))
        names.append(f"{base}.jpg")
    # a listed-but-missing entry must be skipped, not crash
    names.append("missing.jpg")
    with open(tmp_path / "list.txt", "w") as f:
        f.write("\n".join(names) + "\n")

    # real uv_kpt_ind.txt asset (2 rows: x texels, y texels)
    ind = np.stack([np.linspace(2, S - 3, 68).astype(int),
                    np.linspace(3, S - 4, 68).astype(int)])
    np.savetxt(tmp_path / "uv_kpt_ind.txt", ind, fmt="%d")

    ds = build_dataset(dict(type="ThreeHundredWLPDataset",
                            datapath=str(tmp_path / "list.txt"),
                            img_prefix=str(tmp_path), resolution=S,
                            uv_kpt_ind_file=str(tmp_path / "uv_kpt_ind.txt")))
    assert len(ds) == 2
    item = ds[0]
    assert item["faceimg"].shape == (S, S, 3)
    assert item["gt_uvimg"].shape == (S, S, 3)
    assert 0.0 <= item["gt_uvimg"].min() and item["gt_uvimg"].max() <= 1.0

    # evaluate path: perfect predictions -> NME ~ 0
    kpts = []
    for i in range(2):
        uv = ds[i]["gt_uvimg"]
        k2 = uv[ind[1], ind[0], :2].T  # normalized [0,1] uv units
        kpts.append(np.concatenate([k2, np.zeros((1, 68))], 0)[None])
    out = ds.evaluate({"kpt": kpts})
    assert out["nme"] < 1e-6

    # without the real indices, eval must refuse (no fabricated NME)
    ds_bare = build_dataset(dict(type="ThreeHundredWLPDataset",
                                 datapath=str(tmp_path / "list.txt"),
                                 img_prefix=str(tmp_path), resolution=S))
    with pytest.raises(ValueError, match="uv_kpt_ind"):
        ds_bare.evaluate({"kpt": kpts})
