from .registry import Registry, build_from_cfg
from .config import Config, ConfigDict
from .logging import get_root_logger
from .log_buffer import LogBuffer
from .meters import AverageMeter, StandardMetrics
from .message_hub import MessageHub, HistoryBuffer
from .analysis import count_params, get_model_complexity_info
from .weight_init import build_initializer, apply_init_cfg
from .structures import BaseDataElement, InstanceData, PixelData
from . import fileio

__all__ = [
    "Registry",
    "build_from_cfg",
    "Config",
    "ConfigDict",
    "get_root_logger",
    "LogBuffer",
    "AverageMeter",
    "StandardMetrics",
    "MessageHub",
    "HistoryBuffer",
    "count_params",
    "get_model_complexity_info",
    "build_initializer",
    "apply_init_cfg",
    "BaseDataElement",
    "InstanceData",
    "PixelData",
    "fileio",
]
