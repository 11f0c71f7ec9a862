from ..utils.registry import Registry

RUNNERS = Registry("runner")


def build_runner(cfg, default_args=None):
    return RUNNERS.build(dict(cfg), **(default_args or {}))
