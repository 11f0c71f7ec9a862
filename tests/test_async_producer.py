"""Async producer datasets: shared-memory push-style batch delivery."""
import numpy as np
import pytest

from deep3dmap_tpu.datasets import build_dataset


@pytest.fixture(scope="module")
def async_ds():
    ds = build_dataset(dict(
        type="AsyncProducerDataset",
        dataset=dict(type="SyntheticFaceUVDataset", n_samples=6, resolution=16),
        batch_size=2, nthread=2, n_slots=3))
    yield ds
    ds.close()


def test_get_returns_batches(async_ds):
    batch = async_ds.get()
    assert set(batch.keys()) >= {"faceimg", "gt_uvimg", "tform_mat"}
    assert batch["faceimg"].shape == (2, 16, 16, 3)
    assert batch["gt_uvimg"].shape == (2, 16, 16, 3)
    assert np.isfinite(batch["faceimg"]).all()
    # content is real data, not zeros
    assert batch["faceimg"].std() > 0.01


def test_iter_yields_epoch(async_ds):
    batches = list(iter(async_ds))
    assert len(batches) == async_ds.iter_size == 3
    for b in batches:
        assert b["faceimg"].shape == (2, 16, 16, 3)


def test_batches_vary(async_ds):
    a = async_ds.get()["faceimg"]
    b = async_ds.get()["faceimg"]
    c = async_ds.get()["faceimg"]
    # slot recycling works and different samples appear
    assert not (np.allclose(a, b) and np.allclose(b, c))


def test_state_tagging():
    ds = build_dataset(dict(
        type="FaceImagesAsyncDataset",
        dataset=dict(type="SyntheticFaceUVDataset", n_samples=4, resolution=8),
        batch_size=1, nthread=1, n_slots=2))
    try:
        assert ds.state == "sup_unsup"
        batch = ds.get()
        assert batch["faceimg"].shape == (1, 8, 8, 3)
    finally:
        ds.close()
