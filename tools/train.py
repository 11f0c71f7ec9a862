#!/usr/bin/env python
"""Training CLI.

Parity: /root/reference/tools/train.py:181-356 — config-driven: build
dataset(s), framework, runner from a python config file; distributed init;
hook registration; workflow execution.  Usage:

    python tools/train.py configs/neural_recon/scannet_synthetic.py \
        [--work-dir D] [--resume-from auto] [--seed N] \
        [--cfg-options k=v ...] [--launcher none|jax]
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description="Train a 3D reconstruction model")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--work-dir", help="dir to save logs and checkpoints")
    parser.add_argument("--resume-from", help="checkpoint to resume from ('auto' = latest)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-epochs", type=int, default=None, help="override epochs")
    parser.add_argument("--no-validate", action="store_true")
    parser.add_argument("--launcher", choices=["none", "jax"], default="none")
    from deep3dmap_tpu.utils.config import DictAction
    parser.add_argument("--cfg-options", nargs="+", action=DictAction,
                        help="override config entries: key=value")
    return parser.parse_args()


def main():
    args = parse_args()

    from deep3dmap_tpu.utils.misc import maybe_force_platform
    maybe_force_platform()

    from deep3dmap_tpu.utils import Config, get_root_logger
    from deep3dmap_tpu.models import build_reconstruction
    from deep3dmap_tpu.datasets import build_dataset, build_dataloader
    from deep3dmap_tpu.runners import build_runner
    from deep3dmap_tpu.parallel import make_mesh, init_dist, get_dist_info

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    if args.launcher == "jax":
        init_dist()
    rank, world = get_dist_info()

    work_dir = args.work_dir or cfg.get("work_dir", "./work_dir")
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(log_file=osp.join(work_dir, "train.log"), rank=rank)
    logger.info(f"Config: {args.config}  rank={rank}/{world}")

    mesh_cfg = cfg.get("mesh", {})
    mesh = make_mesh(axes=mesh_cfg.get("axes", ("data",)),
                     shape=mesh_cfg.get("shape"))

    # datasets / loaders
    datasets = [build_dataset(cfg.data["train"])]
    workflow = [tuple(w) for w in cfg.get("workflow", [("train", 1)])]
    if len(workflow) > 1 and "val" in cfg.data and not args.no_validate:
        datasets.append(build_dataset(cfg.data["val"]))
    loaders = [build_dataloader(ds, samples_per_gpu=cfg.data.get("samples_per_gpu", 1),
                                workers_per_gpu=cfg.data.get("workers_per_gpu", 0),
                                shuffle=True, seed=args.seed) for ds in datasets]

    # model
    framework = build_reconstruction(cfg.model)
    if cfg.get("need_info_from_datasets") and hasattr(framework, "set_info_from_datasets"):
        framework.set_info_from_datasets(datasets)

    # runner
    runner_cfg = dict(cfg.runner)
    runner_type = runner_cfg.pop("type", "EpochBasedRunner")
    runner_cfgs = dict(runner_cfg.pop("runner_cfgs", {}))
    if args.max_epochs is not None:
        runner_cfgs["max_epochs"] = args.max_epochs
    runner = build_runner(dict(type=runner_type, **runner_cfg),
                          default_args=dict(framework=framework, work_dir=work_dir,
                                            mesh=mesh, seed=args.seed,
                                            runner_cfgs=runner_cfgs))

    sample_batch = next(iter(loaders[0]))
    runner.setup(sample_batch,
                 optimizer=runner_cfgs.get("optimizer"),
                 lr_config=cfg.get("lr_config"),
                 optimizer_config=cfg.get("optimizer_config"),
                 iters_per_epoch=len(loaders[0]))
    runner.register_training_hooks(
        checkpoint_config=cfg.get("checkpoint_config"),
        log_config=cfg.get("log_config"))
    for hook_cfg in cfg.get("custom_hooks", []):
        runner.register_hook_from_cfg(dict(hook_cfg))
    # elastic supervisor liveness beacon (tools/run_elastic.py sets this)
    hb = os.environ.get("D3M_HEARTBEAT_FILE")
    if hb:
        runner.register_hook_from_cfg(dict(
            type="HeartbeatHook", path=hb,
            interval=int(os.environ.get("D3M_HEARTBEAT_INTERVAL", "10"))))

    if args.resume_from:
        runner.resume(None if args.resume_from == "auto" else args.resume_from)
    elif cfg.get("resume_from"):
        runner.resume(cfg.resume_from)

    runner.run(loaders, workflow)
    logger.info("Training finished.")


if __name__ == "__main__":
    main()
