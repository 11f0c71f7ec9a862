#!/usr/bin/env python
"""Real-time NeuralRecon streaming demo.

Parity: /root/reference/demos/demo_neucon.py:17-119 — stream fragments
through the model, incrementally assemble + save the scene mesh, and report
keyframes/sec at the end (the reference's headline harness,
demo_neucon.py:108-115).

Runs on synthetic fragments out of the box; point --scannet at a ScanNet
export (+ fragments pkl) for real data.
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--n-fragments", type=int, default=8)
    p.add_argument("--n-views", type=int, default=9)
    p.add_argument("--n-vox", type=int, default=48)
    p.add_argument("--img", type=int, default=128)
    p.add_argument("--out", default="results/demo_neucon")
    p.add_argument("--scannet", help="ScanNet datapath (optional)")
    p.add_argument("--checkpoint")
    p.add_argument("--preview-every", type=int, default=1,
                   help="refresh the live mesh preview every N fragments "
                        "(0 = off); open3d window when available, PNG "
                        "snapshots under <out>/preview otherwise")
    return p.parse_args()


def main():
    args = parse_args()
    from deep3dmap_tpu.utils.misc import maybe_force_platform
    maybe_force_platform()

    import jax
    import numpy as np

    from deep3dmap_tpu.core.utils.scene_assembler import SceneAssembler
    from deep3dmap_tpu.datasets.builder import _stack_samples
    from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon

    voxel_size = 0.04 if args.scannet else 0.08
    fw = NeuralRecon(dict(
        N_LAYER=3, N_VOX=[args.n_vox] * 3, VOXEL_SIZE=voxel_size,
        TRAIN_NUM_SAMPLE=[4096, 16384, 65536],
        FUSION=dict(FUSION_ON=True, FULL=True),
        BACKBONE2D=dict(ARC="fpn-mnas-1", INFER_MODE="batch")))

    if args.scannet:
        from deep3dmap_tpu.datasets.scannet import ScanNetDataset
        ds = ScanNetDataset(args.scannet, mode="test", nviews=args.n_views)
        frags = [ds[i] for i in range(min(len(ds), args.n_fragments))]
    else:
        from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
        frags = [make_fragment_sample(seed=i, n_views=args.n_views,
                                      img_size=(args.img, args.img),
                                      n_vox=args.n_vox, voxel_size=voxel_size,
                                      scene_reset=(i == 0))
                 for i in range(args.n_fragments)]

    batch0 = _stack_samples([frags[0]])
    params, mstate = fw.init(jax.random.PRNGKey(0), batch0)
    if args.checkpoint:
        from deep3dmap_tpu.runners.checkpoint import load_checkpoint_raw
        params = load_checkpoint_raw(args.checkpoint)["params"]

    fwd = jax.jit(lambda p, s, b: fw.forward_test(p, s, b), donate_argnums=(1,))
    assembler = SceneAssembler(voxel_size=voxel_size, save_dir=args.out)
    viewer = None
    if args.preview_every:
        from deep3dmap_tpu.core.visualize.mesh_viewer import LiveMeshViewer
        viewer = LiveMeshViewer(save_dir=osp.join(args.out, "preview"))

    # warmup/compile on the first fragment
    out, mstate = fwd(params, mstate, jax.device_put(batch0))
    jax.block_until_ready(out["tsdf"])

    t0 = time.time()
    for i, frag in enumerate(frags):
        batch = jax.device_put(_stack_samples([frag]))
        out, mstate = fwd(params, mstate, batch)
        tsdf = np.asarray(jax.device_get(out["tsdf"][0]))
        origin = np.asarray(jax.device_get(out["origin"][0]))
        scene = str(frag.get("scene", "demo_scene"))
        assembler.update(scene, tsdf, origin)
        # incremental visualization: re-mesh the growing scene volume and
        # refresh the viewer (ref visualize.py:8-50 semantics)
        if viewer is not None and (i + 1) % args.preview_every == 0:
            verts, faces = assembler.get_mesh(scene)
            snap = viewer.update(verts, faces)
            extra = f" preview={snap}" if snap else ""
            print(f"fragment {i + 1}/{len(frags)} done{extra}")
        else:
            print(f"fragment {i + 1}/{len(frags)} done")
    duration = time.time() - t0

    if viewer is not None:
        viewer.close()
    paths = assembler.save_all()
    n_key = len(frags) * args.n_views
    print(f"Saved meshes: {paths}")
    print(f"Total time: {duration:.2f}s for {n_key} keyframes")
    print(f"Average keyframes/sec: {n_key / duration:.2f}")


if __name__ == "__main__":
    main()
