#!/usr/bin/env python
"""ScanNet fragment + TSDF GT generation.

Parity: /root/reference/tools/data_gen/scannet.py:50-280 — keyframe
selection by pose deltas (min_angle / min_distance), 9-view fragment
chunking, full-scene TSDF fusion for GT, fragment metadata pkl — with the
ray worker pool replaced by multiprocessing and the PyCUDA kernel by the JAX
TSDF fusion (runs on TPU or CPU).

Usage:
    python tools/data_gen/scannet.py --datapath data/scannet --mode train \
        [--n-proc 4] [--save-tsdf]
"""
import argparse
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--mode", default="train", choices=["train", "val", "test"])
    p.add_argument("--n-views", type=int, default=9)
    p.add_argument("--min-angle", type=float, default=15.0)
    p.add_argument("--min-distance", type=float, default=0.1)
    p.add_argument("--voxel-size", type=float, default=0.04)
    p.add_argument("--save-tsdf", action="store_true",
                   help="also fuse + save full-scene TSDF pyramids")
    p.add_argument("--n-proc", type=int, default=2)
    p.add_argument("--max-scenes", type=int, default=0)
    return p.parse_args()


def select_keyframes(pose_dir, min_angle, min_distance):
    """Keyframes where rotation or translation exceeds thresholds
    (reference tools/data_gen/scannet.py:34-36)."""
    frame_ids = sorted(int(f[:-4]) for f in os.listdir(pose_dir))
    keyframes = []
    last_pose = None
    for fid in frame_ids:
        pose = np.loadtxt(osp.join(pose_dir, f"{fid}.txt"))
        if not np.isfinite(pose).all():
            continue
        if last_pose is None:
            keyframes.append(fid)
            last_pose = pose
            continue
        rel = np.linalg.inv(last_pose) @ pose
        angle = np.rad2deg(np.arccos(np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1)))
        dist = np.linalg.norm(rel[:3, 3])
        if angle > min_angle or dist > min_distance:
            keyframes.append(fid)
            last_pose = pose
    return keyframes


def process_scene(job):
    scene_dir, scene, args_d = job
    args = argparse.Namespace(**args_d)
    pose_dir = osp.join(scene_dir, "pose")
    if not osp.isdir(pose_dir):
        return []
    keyframes = select_keyframes(pose_dir, args.min_angle, args.min_distance)
    metas = []
    for i in range(0, len(keyframes) - args.n_views + 1, args.n_views):
        ids = keyframes[i:i + args.n_views]
        metas.append(dict(scene=scene, fragment_id=i // args.n_views,
                          image_ids=ids, vol_origin=np.zeros(3, np.float32),
                          scene_reset=(i == 0)))
    if args.save_tsdf and metas:
        _save_scene_tsdf(scene_dir, scene, keyframes, args)
    return metas


def _save_scene_tsdf(scene_dir, scene, keyframes, args):
    import cv2
    import jax

    from deep3dmap_tpu.core.tsdf.fusion import TSDFParams, tsdf_fuse_frames

    intr = np.loadtxt(osp.join(scene_dir, "intrinsic", "intrinsic_depth.txt"))[:3, :3]
    depths, poses = [], []
    for fid in keyframes:
        d = cv2.imread(osp.join(scene_dir, "depth", f"{fid}.png"),
                       cv2.IMREAD_ANYDEPTH)
        depths.append(d.astype(np.float32) / 1000.0)
        poses.append(np.loadtxt(osp.join(scene_dir, "pose", f"{fid}.txt")))
    depths = np.stack(depths)
    poses = np.stack(poses).astype(np.float32)

    # scene bounds from camera positions + max depth margin
    cams = poses[:, :3, 3]
    lo = cams.min(0) - 3.0
    hi = cams.max(0) + 3.0
    dims = np.ceil((hi - lo) / args.voxel_size / 8).astype(int) * 8
    params = TSDFParams(dim=tuple(int(d) for d in dims), voxel_size=args.voxel_size)
    tsdf, weight = tsdf_fuse_frames(
        depths, np.stack([intr.astype(np.float32)] * len(depths)), poses,
        lo.astype(np.float32), params)
    np.savez_compressed(osp.join(scene_dir, "full_tsdf.npz"),
                        tsdf=np.asarray(jax.device_get(tsdf)),
                        weight=np.asarray(jax.device_get(weight)),
                        origin=lo, voxel_size=args.voxel_size)


def main():
    args = parse_args()
    sub = "scans_test" if args.mode == "test" else "scans"
    root = osp.join(args.datapath, sub)
    scenes = sorted(os.listdir(root)) if osp.isdir(root) else []
    if args.max_scenes:
        scenes = scenes[: args.max_scenes]

    jobs = [(osp.join(root, s), s, vars(args)) for s in scenes]
    from multiprocessing import get_context

    if args.n_proc > 1 and len(jobs) > 1:
        with get_context("spawn").Pool(args.n_proc) as pool:
            all_metas = pool.map(process_scene, jobs)
    else:
        all_metas = [process_scene(j) for j in jobs]

    metas = [m for ms in all_metas for m in ms]
    out = osp.join(args.datapath, f"fragments_{args.mode}.pkl")
    with open(out, "wb") as f:
        pickle.dump(metas, f)
    print(f"Wrote {len(metas)} fragments from {len(scenes)} scenes to {out}")


if __name__ == "__main__":
    main()
