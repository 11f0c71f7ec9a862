# GNeRF on NeRF-synthetic (Blender) scenes (parity: /root/reference/
# configs/gnerf/ + datasets/blender.py): pose-free NeRF GAN, A->ABAB->B.
_base_ = "./gnerf_synthetic.py"

data_root = "data/nerf_synthetic/lego"
work_dir = "results/gnerf_blender"

data = dict(
    _delete_=True,
    samples_per_gpu=2,
    train=dict(type="BlenderDataset", data_dir=data_root, split="train",
               img_wh=(400, 400)),
    val=dict(type="BlenderDataset", data_dir=data_root, split="val",
             img_wh=(400, 400)),
    test=dict(type="BlenderDataset", data_dir=data_root, split="test",
              img_wh=(400, 400)),
)

model = dict(model_cfgs=dict(
    img_wh=(400, 400), patch_size=64, inv_size=64,
    fc_depth=8, fc_dim=256, N_samples=64, N_importance=64, ndf=64,
    inv_depth=5, near=2.0, far=6.0, azim_range=(0, 360),
    elev_range=(0, 90), radius=(3.5, 4.5),
))

runner = dict(
    state_seq=["A", "ABAB", "B"],
    state_steps=[0, 20, 60],
    runner_cfgs=dict(optimizer=dict(type="Adam", lr=2e-4, betas=(0.0, 0.99)),
                     max_epochs=80),
)
