# Multi-view 3DMM face fitting (synthetic; mirrors
# /root/reference/configs/pt3d_demos/ train_imgs2face structure).
work_dir = "results/imgs2face_synthetic"

checkpoint_config = dict(interval=1)
log_config = dict(interval=4, hooks=[dict(type="TextLoggerHook")])

data = dict(
    samples_per_gpu=2,
    train=dict(type="SyntheticFaceTupleDataset", n_samples=8, tuplesize=2,
               image_size=32, n_verts=256),
    test=dict(type="SyntheticFaceTupleDataset", n_samples=2, tuplesize=2,
              image_size=32, n_verts=256, seed=99),
)

model = dict(
    type="imgs2mesh",
    model_cfgs=dict(tuplesize=2, image_size=32, n_verts=256, use_sampling=False),
)

workflow = [("train", 1)]
runner = dict(
    type="StateMachineRunner",
    state_seq=["sup", "sup_unsup"],
    state_steps=[0, 2],
    runner_cfgs=dict(optimizer=dict(type="Adam", lr=1e-4), max_epochs=3),
)
