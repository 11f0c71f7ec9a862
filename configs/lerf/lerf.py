# LERF on real posed images with pretrained CLIP + DINO features
# (parity: /root/reference/configs/lerf/lerf_config.py riding nerfstudio —
# here: LERFRayDataset pyramid/DINO precompute + hashgrid RGB field with
# proposal sampling).  Import weights first:
#   python tools/import_weights.py clip <ViT ckpt> checkpoints/clip_vitb16.npz
#   python tools/import_weights.py dino <dino_vits8 ckpt> checkpoints/dino_vits8.npz
_base_ = "./lerf_synthetic.py"

data_root = "data/nerf_synthetic/lego"
work_dir = "results/lerf"

data = dict(
    _delete_=True,
    samples_per_gpu=1,
    train=dict(type="LERFRayDataset",
               image_dataset=dict(type="BlenderDataset", data_dir=data_root,
                                  split="train", img_wh=(400, 400)),
               rays_per_batch=4096, n_batches=250,
               clip_n_dims=512, dino_n_dims=384,
               tile_size_range=(0.05, 0.5), tile_size_res=7,
               stride_scaler=0.5,
               clip_npz="checkpoints/clip_vitb16.npz",
               dino_npz="checkpoints/dino_vits8.npz"),
)

model = dict(model_cfgs=dict(
    clip_n_dims=512, dino_n_dims=384,
    rgb_field_type="hashgrid",
    N_proposal=96, N_importance=48,
    rgb_grid_levels=12, rgb_grid_log2=19, rgb_grid_end=1024,
    rgb_hidden=64,
    num_lerf_samples=24, max_scale=2.0, n_scales=30,
    clip_weights="checkpoints/clip_vitb16.npz",
))

runner = dict(type="IterBasedRunner",
              runner_cfgs=dict(optimizer=dict(type="Adam", lr=1e-2),
                               max_iters=30000))
