# LERF language-embedded radiance field (synthetic; mirrors
# /root/reference/configs/lerf/lerf_config.py at reduced scale — the
# reference trains 30k iters, 4096 rays/batch).
work_dir = "results/lerf_synthetic"

checkpoint_config = dict(interval=8, by_epoch=False)
log_config = dict(interval=4, hooks=[dict(type="TextLoggerHook", by_epoch=False)])

data = dict(
    samples_per_gpu=1,
    train=dict(type="LERFRayDataset", rays_per_batch=256, n_batches=8,
               clip_n_dims=64, dino_n_dims=32,
               image_dataset=dict(type="SyntheticNerfDataset", n_images=4,
                                  img_wh=(32, 32))),
    test=dict(type="LERFRayDataset", rays_per_batch=256, n_batches=2,
              clip_n_dims=64, dino_n_dims=32, seed=9,
              image_dataset=dict(type="SyntheticNerfDataset", n_images=2,
                                 img_wh=(32, 32), split="val")),
)

model = dict(
    type="LERF",
    model_cfgs=dict(
        clip_n_dims=64, dino_n_dims=32, N_samples=16, N_importance=16,
        num_lerf_samples=8, fc_depth=3, fc_dim=64,
        grid_layers=(4, 4), grid_sizes=(12, 12),
        grid_resolutions=((8, 32), (32, 64)), hidden=64,
        max_scale=2.0, n_scales=4,
    ),
)

optimizer_config = dict(grad_clip=dict(max_norm=1.0))
lr_config = dict(policy="cosineannealing", min_lr=1e-5)
workflow = [("train", -1)]
runner = dict(
    type="IterBasedRunner",
    runner_cfgs=dict(optimizer=dict(type="Adam", lr=1e-3), max_iters=16),
)
