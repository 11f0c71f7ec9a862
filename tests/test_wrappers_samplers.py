"""Dataset wrappers + samplers (reference dataset_wrappers.py / samplers/)."""
import numpy as np
import pytest

from deep3dmap_tpu.datasets import (ClassBalancedDataset, ConcatDataset,
                                    DistributedGroupSampler,
                                    DistributedSampler,
                                    DistributedVideoSampler, GroupSampler,
                                    MultiImageMixDataset, RepeatDataset,
                                    build_dataloader, build_dataset)
from deep3dmap_tpu.datasets.builder import DATASETS


@DATASETS.register_module(force=True)
class _ToyDataset:
    CLASSES = ("a", "b")

    def __init__(self, n=10, flag_split=5, cat_of=None):
        self.n = n
        flag_split = min(flag_split, n)
        self.flag = np.array([0] * flag_split + [1] * (n - flag_split),
                             dtype=np.uint8)
        self.cat_of = cat_of or (lambda i: [0] if i % 5 else [1])

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return dict(img=np.full((2, 2), float(idx), np.float32), idx=idx)

    def get_cat_ids(self, idx):
        return self.cat_of(idx)

    def evaluate(self, results, logger=None, **kw):
        return {"n_results": len(results)}


def test_concat_dataset():
    ds = ConcatDataset([_ToyDataset(4), _ToyDataset(6)])
    assert len(ds) == 10
    assert ds[5]["idx"] == 1  # second dataset index 1
    assert ds[-1]["idx"] == 5
    ev = ds.evaluate(list(range(10)))
    assert ev == {"0_n_results": 4, "1_n_results": 6}
    assert len(ds.flag) == 10


def test_repeat_dataset():
    ds = RepeatDataset(_ToyDataset(4), times=3)
    assert len(ds) == 12
    assert ds[9]["idx"] == 1
    assert ds.get_cat_ids(5) == ds.dataset.get_cat_ids(1)


def test_class_balanced_dataset():
    # category 1 appears on idx 0,5 only (freq 0.2); cat 0 freq 0.8
    ds = ClassBalancedDataset(_ToyDataset(10), oversample_thr=0.8)
    # repeat factor for images with cat 1: sqrt(0.8/0.2)=2 -> repeated twice
    counts = np.bincount([ds.repeat_indices[i] for i in range(len(ds))])
    assert counts[0] == 2 and counts[5] == 2 and counts[1] == 1
    assert len(ds) == 12


def test_multi_image_mix_dataset():
    class _Mix:
        def get_indexes(self, dataset):
            return [1, 2]

        def __call__(self, results):
            results["mixed"] = sum(r["idx"] for r in results["mix_results"])
            return results

    ds = MultiImageMixDataset(_ToyDataset(5), pipeline=[_Mix()])
    out = ds[0]
    assert out["mixed"] == 3
    assert "mix_results" not in out


def test_build_dataset_wrapper_dispatch():
    cfg = dict(type="RepeatDataset", times=2, dataset=dict(type="_ToyDataset", n=3))
    ds = build_dataset(cfg)
    assert isinstance(ds, RepeatDataset) and len(ds) == 6
    cfg = dict(type="ConcatDataset",
               datasets=[dict(type="_ToyDataset", n=3),
                         dict(type="_ToyDataset", n=4)])
    ds = build_dataset(cfg)
    assert isinstance(ds, ConcatDataset) and len(ds) == 7


def test_group_sampler_blocks_homogeneous():
    ds = _ToyDataset(n=10, flag_split=6)
    sampler = GroupSampler(ds, samples_per_gpu=2)
    idx = list(iter(sampler))
    assert len(idx) == sampler.num_samples
    for b in range(0, len(idx), 2):
        flags = ds.flag[idx[b:b + 2]]
        assert flags[0] == flags[1]


def test_distributed_sampler_partition():
    ds = _ToyDataset(n=10)
    parts = []
    for rank in range(4):
        s = DistributedSampler(ds, num_replicas=4, rank=rank, shuffle=True)
        s.set_epoch(3)
        parts.append(list(iter(s)))
    assert all(len(p) == 3 for p in parts)
    # union covers the dataset (with padding duplicates allowed)
    assert set(np.concatenate(parts)) == set(range(10))


def test_distributed_group_sampler():
    ds = _ToyDataset(n=10, flag_split=6)
    all_idx = []
    for rank in range(2):
        s = DistributedGroupSampler(ds, samples_per_gpu=2, num_replicas=2,
                                    rank=rank)
        idx = list(iter(s))
        assert len(idx) == s.num_samples
        for b in range(0, len(idx), 2):
            flags = ds.flag[idx[b:b + 2]]
            assert flags[0] == flags[1]
        all_idx.extend(idx)
    assert set(all_idx) == set(range(10))


def test_distributed_video_sampler():
    ds = _ToyDataset(n=9)
    ds.data_infos = [dict(frame_id=i % 3) for i in range(9)]  # 3 videos
    parts = [list(iter(DistributedVideoSampler(ds, num_replicas=3, rank=r)))
             for r in range(3)]
    assert parts == [[0, 1, 2], [3, 4, 5], [6, 7, 8]]


def test_build_dataloader_group_aware():
    ds = _ToyDataset(n=8, flag_split=4)
    loader = build_dataloader(ds, samples_per_gpu=2, shuffle=True)
    batches = list(iter(loader))
    assert len(batches) == 4
    for b in batches:
        flags = ds.flag[b["idx"]]
        assert flags[0] == flags[1]


def test_build_dataloader_dist_slices():
    ds = _ToyDataset(n=8, flag_split=8)  # single group
    seen = []
    for rank in range(2):
        import deep3dmap_tpu.parallel.mesh as mesh_mod
        old = mesh_mod.get_dist_info
        mesh_mod.get_dist_info = lambda: (rank, 2)
        try:
            import deep3dmap_tpu.datasets.samplers as samp_mod
            samp_mod.get_dist_info = mesh_mod.get_dist_info
            loader = build_dataloader(ds, samples_per_gpu=2, dist=True,
                                      shuffle=False)
            for b in loader:
                seen.extend(b["idx"].tolist())
        finally:
            mesh_mod.get_dist_info = old
            samp_mod.get_dist_info = old
    assert sorted(seen) == list(range(8))
