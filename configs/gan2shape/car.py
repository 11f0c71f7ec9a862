# Gan2Shape on LSUN-car crops (parity: /root/reference/configs/gan2shape/
# car.py): PSPNet scene-parsing mask prior (21 classes, class 7 = car).
_base_ = "./celeba.py"

data_root = "data/car"
work_dir = "results/gan2shape_car"

data = dict(
    train=dict(img_list_path=f"{data_root}/list.txt",
               img_root=f"{data_root}/images",
               latent_root=f"{data_root}/latents"),
    test=dict(img_list_path=f"{data_root}/list_val.txt",
              img_root=f"{data_root}/images",
              latent_root=f"{data_root}/latents"),
)

model = dict(model_cfgs=dict(
    category="car",
    xyz_rotation_range=30,
    parsing_ckpt="checkpoints/pspnet_voc21.npz",
))
