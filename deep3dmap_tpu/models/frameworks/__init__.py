from .base import BaseFramework, parse_losses
from .neuralrecon import NeuralRecon
from .prnet import FaceImg2UV
from .imgs2mesh import Imgs2Mesh
from .gnerf import GanNerf
from .gan2shape import Gan2Shape
from .lerf import LERFModel

__all__ = ["BaseFramework", "parse_losses", "NeuralRecon", "FaceImg2UV",
           "Imgs2Mesh", "GanNerf", "Gan2Shape", "LERFModel"]
