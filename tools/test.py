#!/usr/bin/env python
"""Evaluation CLI.

Parity: /root/reference/tools/test.py:215-438 — load a checkpoint, run
inference over the test split, collect outputs, call ``dataset.evaluate``.
For NeuralRecon, per-fragment TSDF windows are assembled into scene meshes
(core/utils/scene_assembler.py) and saved as .ply.
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description="Test a 3D reconstruction model")
    parser.add_argument("config")
    parser.add_argument("--checkpoint", help="checkpoint path ('auto' = latest in work_dir)")
    parser.add_argument("--work-dir")
    parser.add_argument("--out", help="directory for saved meshes/results")
    parser.add_argument("--eval", nargs="+", help="evaluation metrics, e.g. nme depth_mesh")
    from deep3dmap_tpu.utils.config import DictAction
    parser.add_argument("--cfg-options", nargs="+", action=DictAction)
    return parser.parse_args()


def main():
    args = parse_args()

    from deep3dmap_tpu.utils.misc import maybe_force_platform
    maybe_force_platform()

    import jax
    import numpy as np

    from deep3dmap_tpu.utils import Config, get_root_logger
    from deep3dmap_tpu.models import build_reconstruction
    from deep3dmap_tpu.datasets import build_dataset, build_dataloader
    from deep3dmap_tpu.parallel import make_mesh, shard_batch
    from deep3dmap_tpu.runners.checkpoint import latest_checkpoint, load_checkpoint

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    work_dir = args.work_dir or cfg.get("work_dir", "./work_dir")
    logger = get_root_logger()

    dataset = build_dataset(cfg.data["test"])
    loader = build_dataloader(dataset, samples_per_gpu=cfg.data.get("samples_per_gpu", 1),
                              workers_per_gpu=cfg.data.get("workers_per_gpu", 0),
                              shuffle=False)

    framework = build_reconstruction(cfg.model)
    mesh = make_mesh()

    def split_meta(batch):
        """Numeric leaves go to the device; strings/objects stay host-side
        (the reference carries these through DataContainer metadata)."""
        dev, meta = {}, {}
        for k, v in batch.items():
            leaves = jax.tree_util.tree_leaves(v)
            if leaves and all(
                    isinstance(l, (int, float, np.number)) or
                    (isinstance(l, np.ndarray) and l.dtype.kind in "bifuc")
                    for l in leaves):
                dev[k] = v
            else:
                meta[k] = v
        return dev, meta

    batch0, _ = split_meta(next(iter(loader)))
    params, mstate = framework.init(jax.random.PRNGKey(0), shard_batch(batch0, mesh))

    ckpt = args.checkpoint
    if ckpt in (None, "auto"):
        ckpt = latest_checkpoint(work_dir)
    if ckpt:
        from deep3dmap_tpu.runners.checkpoint import load_checkpoint_raw
        restored = load_checkpoint_raw(ckpt)
        params = restored["params"]
        raw_ms = restored.get("model_state")
        if raw_ms:
            # re-wrap raw dicts into the framework's model_state containers
            # (NamedTuples etc.) by leaf order
            leaves = jax.tree_util.tree_leaves(raw_ms)
            treedef = jax.tree_util.tree_structure(mstate)
            if treedef.num_leaves == len(leaves):
                mstate = jax.tree_util.tree_unflatten(treedef, leaves)
        logger.info(f"Loaded checkpoint {ckpt}")

    fwd = jax.jit(lambda p, s, b: framework.forward_test(p, s, b))

    assembler = None
    if cfg.model.get("model_cfgs", {}).get("save_scene"):
        from deep3dmap_tpu.core.utils.scene_assembler import SceneAssembler
        assembler = SceneAssembler(
            voxel_size=cfg.model["model_cfgs"].get("VOXEL_SIZE", 0.04),
            save_dir=args.out or osp.join(work_dir, "meshes"))

    outputs = {}
    for i, raw in enumerate(loader):
        batch, meta = split_meta(raw)
        out, mstate = fwd(params, mstate, shard_batch(batch, mesh))
        out = jax.device_get(out)
        for k, v in out.items():
            outputs.setdefault(k, []).append(np.asarray(v))
        if assembler is not None and "tsdf" in out:
            scenes = meta.get("scene", batch.get("scene",
                              [f"scene{i}"] * len(out["tsdf"])))
            for b in range(len(out["tsdf"])):
                assembler.update(str(scenes[b]), out["tsdf"][b], out["origin"][b])
        logger.info(f"batch {i + 1}/{len(loader)} done")

    if assembler is not None:
        scene_names = list(assembler.scenes)
        paths = assembler.save_all()
        logger.info(f"Saved {len(paths)} scene meshes")
        # mesh-based ScanNet eval consumes (scene_name, mesh_path) pairs
        # (datasets/scannet.py:98-121; ref scannet.py:157-290 passes the
        # saved .ply per scene to the ray workers)
        outputs["scene_name"] = scene_names
        outputs["mesh_path"] = paths

    if args.eval and hasattr(dataset, "evaluate"):
        results = dataset.evaluate(outputs, metric=args.eval[0])
        logger.info(f"Evaluation: {results}")
        print(results)


if __name__ == "__main__":
    main()
