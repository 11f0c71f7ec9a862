from .builder import (
    MODELS,
    BACKBONES,
    LOSSES,
    RECONSTRUCTORS,
    build_backbone,
    build_loss,
    build_reconstruction,
)

from . import backbones, modulars, frameworks, losses, parsing  # noqa: F401  (register)

__all__ = [
    "MODELS",
    "BACKBONES",
    "LOSSES",
    "RECONSTRUCTORS",
    "build_backbone",
    "build_loss",
    "build_reconstruction",
]
