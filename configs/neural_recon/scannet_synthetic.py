# NeuralRecon on synthetic ScanNet-like fragments (smoke/CI-runnable).
# Mirrors the key structure of the reference config
# (/root/reference/configs/neural_recon/scannet.py) at reduced scale.
N_VIEWS = 5
VOXEL_SIZE = 0.08
N_VOX = 32
work_dir = "results/neucon_synthetic"

checkpoint_config = dict(interval=1)
log_config = dict(interval=2, hooks=[dict(type="TextLoggerHook")])
resume_from = None

data = dict(
    samples_per_gpu=1,
    train=dict(type="SyntheticScanNetDataset", n_samples=4, n_views=N_VIEWS,
               img_size=(64, 64), n_vox=N_VOX, voxel_size=VOXEL_SIZE, n_layers=3),
    test=dict(type="SyntheticScanNetDataset", n_samples=2, n_views=N_VIEWS,
              img_size=(64, 64), n_vox=N_VOX, voxel_size=VOXEL_SIZE, n_layers=3,
              seed=100),
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
        FUSION=dict(FUSION_ON=True, HIDDEN_DIM=64, AVERAGE=False, FULL=True),
        LW=[1.0, 0.8, 0.64],
        THRESHOLDS=[0, 0, 0],
        POS_WEIGHT=1.5,
    ),
)

optimizer_config = dict(grad_clip=dict(max_norm=1.0))
lr_config = dict(policy="step", gamma=0.5, step=[12, 24, 48])
workflow = [("train", 1)]
runner = dict(
    type="EpochBasedRunner",
    runner_cfgs=dict(
        optimizer=dict(type="Adam", lr=1e-3, betas=(0.9, 0.999), weight_decay=0.0),
        max_epochs=2,
    ),
)
