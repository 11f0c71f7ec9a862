"""Data-pipeline tests + ScanNet layout round trip on synthetic data."""
import os
import os.path as osp
import pickle
import subprocess
import sys

import numpy as np
import pytest

from deep3dmap_tpu.datasets.pipelines import (
    Collect,
    Compose,
    Normalize,
    Pad,
    RandomFlip,
    Resize,
    SeqIntrinsicsPoseToProjection,
    SeqNormalizeImages,
    SeqRandomTransformSpace,
    SeqResizeImage,
)
from deep3dmap_tpu.datasets.scannet import ScanNetDataset
from deep3dmap_tpu.datasets.synthetic import make_fragment_sample


def test_basic_transforms():
    img = np.random.RandomState(0).randint(0, 255, (37, 41, 3)).astype(np.uint8)
    data = {"img": img}
    data = Resize((32, 32))(data)
    assert data["img"].shape == (32, 32, 3)
    data = Normalize(mean=[0, 0, 0], std=[255, 255, 255])(data)
    assert data["img"].max() <= 1.0
    data = Pad(size_divisor=16)(data)
    assert data["img"].shape[0] % 16 == 0
    data = Collect(keys=["img"])(data)
    assert list(data) == ["img"]


def test_compose_from_cfg():
    pipe = Compose([
        dict(type="Resize", size=(16, 16)),
        dict(type="Normalize", mean=[127.5] * 3, std=[127.5] * 3),
    ])
    out = pipe({"img": np.zeros((32, 32, 3), np.uint8)})
    assert out["img"].shape == (16, 16, 3)
    np.testing.assert_allclose(out["img"], -1.0)


def _fake_scannet(root, scene="scene0000_00", n_frames=10):
    """Write a ScanNet-layout scene from the synthetic SDF renderer."""
    import cv2

    s = make_fragment_sample(seed=0, n_views=n_frames, img_size=(48, 64),
                             n_vox=24, voxel_size=0.08)
    d = osp.join(root, "scans", scene)
    for sub in ("color", "depth", "pose", "intrinsic"):
        os.makedirs(osp.join(d, sub), exist_ok=True)
    K4 = np.eye(4)
    K4[:3, :3] = s["intrinsics"][0]
    np.savetxt(osp.join(d, "intrinsic", "intrinsic_depth.txt"), K4)
    for i in range(n_frames):
        cv2.imwrite(osp.join(d, "color", f"{i}.jpg"),
                    (s["imgs"][i] * 255).astype(np.uint8))
        cv2.imwrite(osp.join(d, "depth", f"{i}.png"),
                    (s["depth"][i] * 1000).astype(np.uint16))
        np.savetxt(osp.join(d, "pose", f"{i}.txt"), s["extrinsics"][i])
    return s


@pytest.mark.slow
def test_scannet_roundtrip(tmp_path):
    root = str(tmp_path)
    _fake_scannet(root)

    # data-gen: fragments pkl
    env = dict(os.environ, D3M_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "tools/data_gen/scannet.py", "--datapath", root,
         "--mode", "train", "--n-views", "5", "--min-angle", "1",
         "--min-distance", "0.01", "--n-proc", "1"],
        capture_output=True, text=True,
        cwd=osp.dirname(osp.dirname(osp.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    with open(osp.join(root, "fragments_train.pkl"), "rb") as f:
        metas = pickle.load(f)
    assert len(metas) >= 1
    assert metas[0]["scene"] == "scene0000_00"

    # dataset + full reference-style pipeline
    pipeline = [
        dict(type="SeqResizeImage", size=(64, 48), depth_key="depth"),
        dict(type="SeqRandomTransformSpace", voxel_dim=(24, 24, 24),
             voxel_size=0.08, random_rotation=False, random_translation=False,
             n_layers=3),
        dict(type="SeqIntrinsicsPoseToProjection", n_views=5, stride=4),
        dict(type="SeqNormalizeImages", mean=[127.5] * 3, std=[127.5] * 3),
    ]
    ds = ScanNetDataset(root, mode="train", nviews=5, img_size=(64, 48),
                        n_vox=24, voxel_size=0.08, pipeline=pipeline)
    assert len(ds) >= 1
    sample = ds[0]
    assert sample["imgs"].shape == (5, 48, 64, 3)
    assert sample["proj_matrices"].shape == (5, 3, 4, 4)
    assert sample["tsdf_list"][0].shape == (24, 24, 24)
    assert sample["occ_list"][0].sum() > 0
    assert sample["world_to_aligned_camera"].shape == (4, 4)

    # the sample feeds the model end-to-end
    import jax

    from deep3dmap_tpu.datasets.builder import _stack_samples
    from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon

    batch = _stack_samples([{k: v for k, v in sample.items()
                             if k not in ("scene", "fragment", "epoch", "depth")}])
    batch["scene_reset"] = np.ones(1, np.float32)
    fw = NeuralRecon(dict(N_LAYER=3, N_VOX=[24] * 3, VOXEL_SIZE=0.08,
                          FUSION=dict(FUSION_ON=True, FULL=True),
                          BACKBONE2D=dict(ARC="fpn-mnas-0.5")))
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    loss, aux = fw.loss_fn(params, mstate, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
