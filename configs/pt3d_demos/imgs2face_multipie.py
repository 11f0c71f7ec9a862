# Multi-view 3DMM face fitting on real MultiPIE data.
# Parity: /root/reference/configs/pt3d_demos/imgs2face_multipie.py — the
# sup/unsup state sequence over MultiPIE tuples; the torch async producer
# datasets become either the map-style MultiPIEFaceTupleDataset (pull path,
# worker threads) or FaceTexUVAsyncDataset wrapping it (push path).
# Data layout from tools/data_gen/multipie.py organize.
work_dir = "results/imgs2face_multipie"

checkpoint_config = dict(interval=1)
log_config = dict(interval=10, hooks=[dict(type="TextLoggerHook")])
resume_from = None

state_seq = ["sup", "sup_unsup"]
image_size = 256
tuplesize = 3
n_verts = 512   # registered-scan vertex count (set to your template's)

data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        type="MultiPIEFaceTupleDataset",
        datadir="data/multipie",
        imgdir="data/multipie/images",
        objroot="data/multipie/objs",
        tuplesize=tuplesize,
        image_size=image_size),
    test=dict(
        type="MultiPIEFaceTupleDataset",
        datadir="data/multipie",
        imgdir="data/multipie/images",
        objroot="data/multipie/objs",
        tuplesize=tuplesize,
        image_size=image_size,
        seed=99),
)

model = dict(
    type="imgs2mesh",
    model_cfgs=dict(
        tuplesize=tuplesize,
        image_size=image_size,
        n_verts=n_verts,
        use_sampling=True),
)

workflow = [("train", 1)]
runner = dict(
    type="StateMachineRunner",
    state_seq=state_seq,
    state_steps=[0, 8],
    runner_cfgs=dict(optimizer=dict(type="Adam", lr=1e-4), max_epochs=16),
)
