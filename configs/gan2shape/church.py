# Gan2Shape on LSUN-church (parity: /root/reference/configs/gan2shape/
# church.py): PSPNet ADE 150-class parsing, class 1 = building.
_base_ = "./car.py"

data_root = "data/church"
work_dir = "results/gan2shape_church"

model = dict(model_cfgs=dict(
    category="church",
    parsing_ckpt="checkpoints/pspnet_ade150.npz",
))
