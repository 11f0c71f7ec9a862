# PRNet on 300W-LP UV position maps, NME eval on the generated landmarks
# (parity: /root/reference/configs/prnet/prnet_300wlp.py).  Prepare data
# with tools/data_gen/prnet.py (writes *_inp.jpg, *.npy, list.txt and
# uv_kpt_ind.txt into data_root).
_base_ = "./prnet_synthetic.py"

data_root = "data/300wlp_256"
work_dir = "results/prnet_300wlp"

data = dict(
    _delete_=True,
    samples_per_gpu=16,
    train=dict(type="ThreeHundredWLPDataset",
               datapath=f"{data_root}/list.txt",
               img_prefix=data_root, resolution=256,
               uv_kpt_ind_file=f"{data_root}/uv_kpt_ind.txt"),
    test=dict(type="ThreeHundredWLPDataset",
              datapath=f"{data_root}/list_val.txt",
              img_prefix=data_root, resolution=256,
              uv_kpt_ind_file=f"{data_root}/uv_kpt_ind.txt"),
)

model = dict(model_cfgs=dict(
    _delete_=True,
    resolution=256, base_channels=16,
    uv_kpt_ind_file=f"{data_root}/uv_kpt_ind.txt",
))

lr_config = dict(policy="step", gamma=0.5, step=[15, 25])
evaluation = dict(interval=1, metric="nme", save_best="nme")
runner = dict(runner_cfgs=dict(optimizer=dict(type="Adam", lr=1e-4),
                               max_epochs=32))
