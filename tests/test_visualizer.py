"""Visualizer + vis backends (SURVEY.md §2.9 visualization surface)."""
import json
import numpy as np
import pytest

from deep3dmap_tpu.core.visualize import (LocalVisBackend, Visualizer,
                                          VISBACKENDS)


def test_local_backend_scalars_and_images(tmp_path):
    vis = Visualizer(vis_backends=[dict(type="LocalVisBackend")],
                     save_dir=str(tmp_path))
    vis.add_config({"lr": 0.1})
    vis.add_scalar("loss", 1.5, step=1)
    vis.add_scalars({"a": 1.0, "b": 2.0}, step=2)
    img = np.zeros((16, 16, 3), np.uint8)
    vis.set_image(img)
    vis.draw_points(np.array([[4, 4]])).draw_bboxes(np.array([[2, 2, 12, 12]]))
    vis.draw_binary_masks(np.ones((16, 16), bool), alphas=0.5)
    vis.add_image("frame")
    vis.close()
    lines = [json.loads(l) for l in
             (tmp_path / "scalars.json").read_text().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[1]["a"] == 1.0
    assert (tmp_path / "config.py").exists()
    imgs = list((tmp_path / "vis_image").iterdir())
    assert len(imgs) == 1
    # drawing happened in place
    out = vis.get_image()
    assert out.sum() > 0


def test_draw_primitives_geometry():
    vis = Visualizer()
    vis.set_image(np.zeros((10, 10, 3), np.uint8))
    vis.draw_bboxes(np.array([[1, 1, 8, 8]]), edge_colors=(255, 0, 0))
    img = vis.get_image()
    assert (img[1, 1:9, 0] == 255).all()   # top edge
    assert (img[8, 1:9, 0] == 255).all()   # bottom edge
    assert (img[5, 5] == 0).all()          # interior untouched


def test_registry_has_all_backends():
    for name in ["LocalVisBackend", "TensorboardVisBackend",
                 "WandbVisBackend", "MlflowVisBackend"]:
        assert VISBACKENDS.get(name) is not None


def test_gated_backend_fails_only_on_use(tmp_path):
    vis = Visualizer(vis_backends=[dict(type="MlflowVisBackend")],
                     save_dir=str(tmp_path))
    with pytest.raises(Exception):
        vis.add_scalar("x", 1.0)  # mlflow not in image -> ImportError on use
