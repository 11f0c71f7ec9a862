"""Train -> checkpoint -> eval quality regression + GRU-fusion ablation.

The first end-to-end proof that the framework LEARNS reconstructions (r4
Missing #2/#3): on the generated fixture scene it

  1. runs ``tools/train.py`` for a few hundred steps (tiny shapes),
  2. evaluates with ``tools/test.py`` — untrained baseline vs the trained
     checkpoint — through the full inference -> SceneAssembler -> .ply ->
     ``ScanNetDataset.evaluate`` pipeline (the reference's de-facto
     regression oracle, /root/reference/tools/test.py:215-438 +
     datasets/scannet.py:157-290; upstream headline F-score 0.562 at full
     ScanNet scale per BASELINE.md),
  3. repeats training with FUSION_ON=False to quantify what the ConvGRU
     temporal fusion — the method's core claim (gru_fusion.py:183-314) —
     contributes on the multi-fragment scene,
  4. writes the numbers to a round artifact (QUALITY_r{N}.json).

This is an OVERFIT regression (train and eval on the same fixture scene):
it certifies the optimization + eval loop learns the scene, not
generalization — the right scope for a CI-sized oracle.

Usage:
    python tools/quality_regression.py --out QUALITY_r05.json \
        [--epochs 120] [--workdir /tmp/qr] [--keep]
"""
import argparse
import ast
import json
import os
import os.path as osp
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

CONFIG_TMPL = """
N_VIEWS = 5
VOXEL_SIZE = 0.08
N_VOX = 24
work_dir = {work_dir!r}

pipeline = [
    dict(type="SeqResizeImage", size=(64, 48), depth_key="depth"),
    dict(type="SeqRandomTransformSpace", voxel_dim=(N_VOX, N_VOX, N_VOX),
         voxel_size=VOXEL_SIZE, random_rotation=False,
         random_translation=False, n_layers=3),
    dict(type="SeqIntrinsicsPoseToProjection", n_views=N_VIEWS, stride=4),
    dict(type="SeqNormalizeImages", mean=[127.5] * 3, std=[127.5] * 3),
]

data = dict(
    samples_per_gpu=1,
    train=dict(type="ScanNetDataset", datapath={datapath!r}, mode="train",
               nviews=N_VIEWS, n_scales=2, img_size=(64, 48), n_vox=N_VOX,
               voxel_size=VOXEL_SIZE, pipeline=pipeline),
    test=dict(type="ScanNetDataset", datapath={datapath!r}, mode="test",
              nviews=N_VIEWS, n_scales=2, img_size=(64, 48), n_vox=N_VOX,
              voxel_size=VOXEL_SIZE, pipeline=pipeline),
)

model = dict(
    type="NeuralRecon",
    model_cfgs=dict(
        save_scene=True,
        N_LAYER=3,
        N_VOX=[N_VOX, N_VOX, N_VOX],
        VOXEL_SIZE=VOXEL_SIZE,
        TRAIN_NUM_SAMPLE=[512, 2048, 8192],
        BACKBONE2D=dict(ARC="fpn-mnas-0.5", INFER_MODE="batch"),
        FUSION=dict(FUSION_ON={fusion}, FULL=True),
        LW=[1.0, 0.8, 0.64],
        THRESHOLDS=[0, 0, 0],
        POS_WEIGHT=1.5,
    ),
)

checkpoint_config = dict(interval=40)
log_config = dict(interval=20, hooks=[dict(type="TextLoggerHook")])
optimizer_config = dict(grad_clip=dict(max_norm=1.0))
lr_config = dict(policy="step", gamma=0.5, step=[60, 90])
workflow = [("train", 1)]
runner = dict(
    type="EpochBasedRunner",
    runner_cfgs=dict(
        optimizer=dict(type="Adam", lr=1e-3, betas=(0.9, 0.999),
                       weight_decay=0.0),
        max_epochs={epochs},
    ),
)
"""


def run(cmd, env, tag):
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    if r.returncode != 0:
        sys.stderr.write(f"[{tag}] FAILED\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}\n")
        raise SystemExit(1)
    return r


def eval_metrics(cfg_path, out_dir, env, checkpoint=None):
    cmd = [sys.executable, "tools/test.py", cfg_path, "--out", out_dir,
           "--eval", "depth_mesh"]
    if checkpoint:
        cmd += ["--checkpoint", checkpoint]
    r = run(cmd, env, f"eval ckpt={checkpoint}")
    last = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    return ast.literal_eval(last)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="QUALITY_r05.json")
    ap.add_argument("--epochs", type=int, default=120,
                    help="epochs (~2 fragment steps each) per variant")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default, deterministic CI) or tpu")
    args = ap.parse_args()

    wd = args.workdir or tempfile.mkdtemp(prefix="d3m_quality_")
    os.makedirs(wd, exist_ok=True)
    root = osp.join(wd, "data")
    os.makedirs(root, exist_ok=True)
    env = dict(os.environ)
    if args.platform == "cpu":
        env.update(D3M_PLATFORM="cpu", JAX_PLATFORMS="cpu")

    print("[1/5] fixture scene + data-gen", flush=True)
    from deep3dmap_tpu.datasets.synthetic import write_scannet_fixture

    write_scannet_fixture(root, splits=("train", "test"), n_frames=10)
    for mode in ("train", "test"):
        run([sys.executable, "tools/data_gen/scannet.py", "--datapath", root,
             "--mode", mode, "--n-views", "5", "--min-angle", "1",
             "--min-distance", "0.01", "--n-proc", "1"], env, f"datagen {mode}")

    results = {"round": 5, "epochs": args.epochs,
               "note": "overfit regression on the synthetic fixture scene "
                       "(train==eval scene); certifies the train->checkpoint"
                       "->eval loop learns reconstructions, not "
                       "generalization"}
    for fusion in (True, False):
        tag = "fusion" if fusion else "nofusion"
        vdir = osp.join(wd, tag)
        cfg_path = osp.join(wd, f"cfg_{tag}.py")
        with open(cfg_path, "w") as f:
            f.write(CONFIG_TMPL.format(work_dir=vdir, datapath=root,
                                       fusion=fusion, epochs=args.epochs))
        print(f"[2/5] untrained eval ({tag})", flush=True)
        results[f"untrained_{tag}"] = eval_metrics(
            cfg_path, osp.join(wd, f"meshes_untrained_{tag}"), env)
        print(f"[3/5] train {args.epochs} epochs ({tag})", flush=True)
        run([sys.executable, "tools/train.py", cfg_path,
             "--work-dir", vdir], env, f"train {tag}")
        print(f"[4/5] trained eval ({tag})", flush=True)
        results[f"trained_{tag}"] = eval_metrics(
            cfg_path, osp.join(wd, f"meshes_trained_{tag}"), env,
            checkpoint="auto")

    tr, un = results["trained_fusion"], results["untrained_fusion"]
    results["fscore_gain_vs_untrained"] = round(tr["fscore"] - un["fscore"], 4)
    results["absrel_drop_vs_untrained"] = round(un["AbsRel"] - tr["AbsRel"], 4)
    results["fusion_delta_fscore"] = round(
        tr["fscore"] - results["trained_nofusion"]["fscore"], 4)
    ok = (tr["fscore"] > un["fscore"] + 0.05
          and tr["AbsRel"] < un["AbsRel"])
    results["learns_reconstruction"] = bool(ok)

    print("[5/5] writing", args.out, flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if not isinstance(v, dict)}, indent=1))
    if not args.keep:
        shutil.rmtree(wd, ignore_errors=True)
    if not ok:
        sys.stderr.write("quality regression FAILED: trained model does not "
                         "beat the untrained baseline\n")
        raise SystemExit(2)


if __name__ == "__main__":
    main()
