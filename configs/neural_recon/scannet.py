# NeuralRecon on ScanNet — production config matching the reference
# (/root/reference/configs/neural_recon/scannet.py) key-for-key.
# Requires the ScanNet download + TSDF GT (tools/data_gen/scannet.py).
_base_ = "./scannet_synthetic.py"

N_VIEWS = 9
VOXEL_SIZE = 0.04
work_dir = "results/neucon_scannet"

data = dict(
    _delete_=True,
    samples_per_gpu=1,
    train=dict(type="ScanNetDataset", datapath="data/scannet", mode="train",
               nviews=N_VIEWS, n_scales=2, img_size=(640, 480), n_vox=96,
               voxel_size=VOXEL_SIZE),
    test=dict(type="ScanNetDataset", datapath="data/scannet", mode="test",
              nviews=N_VIEWS, n_scales=2, img_size=(640, 480), n_vox=96,
              voxel_size=VOXEL_SIZE),
)

# Global recurrent hidden extent per scale, derived from scene bounds:
# ScanNet scenes span up to ~10 m, so the hidden volumes must cover
# ceil(extent / voxel_size) voxels at each scale — NOT one fragment window
# (the default), which would alias every fragment beyond 3.84 m into the
# same corner window.  10.24 m / 0.04 m = 256 fine voxels.  Memory:
# 256³·24ch·f32 ≈ 1.6 GB/scene — shard spatially over the mesh 'model'
# axis for multi-chip runs (parallel/spatial.shard_global_volumes).
SCENE_EXTENT_M = 10.24
GLOBAL_DIMS = [int(SCENE_EXTENT_M / (VOXEL_SIZE * 2 ** (2 - s)))
               for s in range(3)]  # [64, 128, 256]

model = dict(
    model_cfgs=dict(
        N_VOX=[96, 96, 96],
        VOXEL_SIZE=VOXEL_SIZE,
        TRAIN_NUM_SAMPLE=[4096, 16384, 65536],
        # INFER_MODE="batch": views folded into one conv batch at inference
        # (+28% on chip; numerically-identical params, opt-in vs the scanned
        # trunk the default follows)
        BACKBONE2D=dict(ARC="fpn-mnas-1", INFER_MODE="batch"),
        GLOBAL_DIMS=GLOBAL_DIMS,
    ),
)

runner = dict(runner_cfgs=dict(max_epochs=29))
