# GNeRF pose-free NeRF GAN (synthetic; mirrors
# /root/reference/configs/gnerf/ structure).
work_dir = "results/gnerf_synthetic"

checkpoint_config = dict(interval=2)
log_config = dict(interval=2, hooks=[dict(type="TextLoggerHook")])
need_info_from_datasets = True

data = dict(
    samples_per_gpu=2,
    train=dict(type="SyntheticNerfDataset", n_images=8, img_wh=(32, 32)),
    val=dict(type="SyntheticNerfDataset", n_images=2, img_wh=(32, 32), split="val"),
    test=dict(type="SyntheticNerfDataset", n_images=2, img_wh=(32, 32), split="val"),
)

model = dict(
    type="GanNerf",
    model_cfgs=dict(
        img_wh=(32, 32), patch_size=16, inv_size=16, pose_mode="6d",
        fc_depth=4, fc_dim=64, N_samples=16, N_importance=16, ndf=32,
        inv_depth=3, near=0.5, far=4.0, azim_range=(0, 360),
        elev_range=(0, 60), radius=(1.5, 2.5),
    ),
)

workflow = [("train", 1)]
runner = dict(
    type="StateMachineRunner",
    state_seq=["A", "ABAB", "B"],
    state_steps=[0, 2, 4],
    runner_cfgs=dict(optimizer=dict(type="Adam", lr=2e-4, betas=(0.0, 0.99)),
                     max_epochs=6),
)
