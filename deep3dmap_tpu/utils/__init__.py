from .registry import Registry, build_from_cfg
from .config import Config, ConfigDict
from .logging import get_root_logger
from .log_buffer import LogBuffer
from .meters import AverageMeter, StandardMetrics

__all__ = [
    "Registry",
    "build_from_cfg",
    "Config",
    "ConfigDict",
    "get_root_logger",
    "LogBuffer",
    "AverageMeter",
    "StandardMetrics",
]
