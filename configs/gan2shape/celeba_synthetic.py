# Gan2Shape per-instance fitting (synthetic; mirrors
# /root/reference/configs/gan2shape/celeba.py structure).
work_dir = "results/gan2shape_synthetic"

checkpoint_config = dict(interval=1)
log_config = dict(interval=1, hooks=[dict(type="TextLoggerHook")])

data = dict(
    samples_per_gpu=1,
    train=dict(type="SyntheticGanFaceDataset", n_samples=4, image_size=32, z_dim=32),
    test=dict(type="SyntheticGanFaceDataset", n_samples=2, image_size=32, z_dim=32,
              seed=77),
)

model = dict(
    type="Gan2Shape",
    model_cfgs=dict(
        image_size=32, gan_size=32, z_dim=32, n_mlp=4, nf=8, batchsize=2,
        channel_multiplier=1,
        min_depth=0.9, max_depth=1.1,
        xyz_rotation_range=60, xy_translation_range=0.1, z_translation_range=0.1,
        lam_perc=1.0, lam_smooth=0.01, lam_regular=0.01,
        # pretrained StyleGAN2 weights (.npz with 'g'/'d' trees); random init
        # when absent
        gan_ckpt=None,
    ),
)

workflow = [("train", 1)]
runner = dict(
    type="Gan2ShapeRunner",
    stage_iters=(4, 4, 4),  # reference: (600, 600, 400) per stage at scale
    num_stage=1,
    runner_cfgs=dict(optimizer=dict(type="Adam", lr=1e-4), max_epochs=2),
)
