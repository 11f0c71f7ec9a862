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

model = dict(
    model_cfgs=dict(
        N_VOX=[96, 96, 96],
        VOXEL_SIZE=VOXEL_SIZE,
        TRAIN_NUM_SAMPLE=[4096, 16384, 65536],
        BACKBONE2D=dict(ARC="fpn-mnas-1"),
    ),
)

runner = dict(runner_cfgs=dict(max_epochs=29))
