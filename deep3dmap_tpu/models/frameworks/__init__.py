from .base import BaseFramework, parse_losses
from .neuralrecon import NeuralRecon

__all__ = ["BaseFramework", "parse_losses", "NeuralRecon"]
