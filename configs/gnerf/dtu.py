# GNeRF on DTU scans (parity: /root/reference/configs/gnerf/ +
# datasets/dtu.py).
_base_ = "./blender.py"

data_root = "data/dtu/scan104"
work_dir = "results/gnerf_dtu"

data = dict(
    train=dict(_delete_=True, type="DTUDataset", data_dir=data_root,
               split="train", img_wh=(400, 300)),
    val=dict(_delete_=True, type="DTUDataset", data_dir=data_root,
             split="val", img_wh=(400, 300)),
    test=dict(_delete_=True, type="DTUDataset", data_dir=data_root,
              split="val", img_wh=(400, 300)),
)

model = dict(model_cfgs=dict(
    img_wh=(400, 300), elev_range=(60, 90), radius=(4.0, 6.0),
))
