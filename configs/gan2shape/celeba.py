# Gan2Shape on CelebA-HQ crops + pre-projected StyleGAN2 w-latents
# (parity: /root/reference/configs/gan2shape/celeba.py — same dataset
# contract: image list + per-image latent .npy, BiSeNet face mask prior).
# Point data_root at the prepared directory (images + latents + list.txt);
# all paths are overridable with --cfg-options.
_base_ = "./celeba_synthetic.py"

data_root = "data/celeba"
work_dir = "results/gan2shape_celeba"

data = dict(
    _delete_=True,
    samples_per_gpu=1,
    train=dict(type="CelebaDataset",
               img_list_path=f"{data_root}/list.txt",
               img_root=f"{data_root}/images",
               latent_root=f"{data_root}/latents",
               image_size=128),
    test=dict(type="CelebaDataset",
              img_list_path=f"{data_root}/list_val.txt",
              img_root=f"{data_root}/images",
              latent_root=f"{data_root}/latents",
              image_size=128),
)

model = dict(model_cfgs=dict(
    _delete_=True,
    image_size=128, gan_size=128, z_dim=512, n_mlp=8, nf=32,
    channel_multiplier=1, batchsize=4,
    min_depth=0.9, max_depth=1.1,
    xyz_rotation_range=60, xy_translation_range=0.1, z_translation_range=0.1,
    lam_perc=1.0, lam_smooth=0.01, lam_regular=0.01,
    use_mask=True, category="face",
    # tools/import_weights.py outputs:
    gan_ckpt="checkpoints/stylegan2_celeba.npz",      # kind=stylegan2
    parsing_ckpt="checkpoints/bisenet_faceparse.npz",  # kind=bisenet
))

runner = dict(
    stage_iters=(600, 600, 400),
    num_stage=4,
    runner_cfgs=dict(optimizer=dict(type="Adam", lr=1e-4), max_epochs=4),
)
