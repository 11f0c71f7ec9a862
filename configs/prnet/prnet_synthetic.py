# PRNet position-map regression (synthetic smoke config; mirrors
# /root/reference/configs/prnet/prnet_300wlp.py structure).
work_dir = "results/prnet_synthetic"

checkpoint_config = dict(interval=1)
log_config = dict(interval=4, hooks=[dict(type="TextLoggerHook")])

data = dict(
    samples_per_gpu=4,
    train=dict(type="SyntheticFaceUVDataset", n_samples=16, resolution=64),
    test=dict(type="SyntheticFaceUVDataset", n_samples=4, resolution=64, seed=99),
)

model = dict(
    type="faceimg2uv",
    model_cfgs=dict(resolution=64, base_channels=8),
)

optimizer_config = dict()
lr_config = dict(policy="step", gamma=0.5, step=[10, 20])
workflow = [("train", 1)]
runner = dict(
    type="EpochBasedRunner",
    runner_cfgs=dict(optimizer=dict(type="Adam", lr=1e-4), max_epochs=2),
)
