from .camera_scene import plot_camera_scene
from .mesh_viewer import save_mesh_preview
from .visualizer import (VISBACKENDS, BaseVisBackend, LocalVisBackend,
                         MlflowVisBackend, TensorboardVisBackend, Visualizer,
                         WandbVisBackend)

__all__ = ["plot_camera_scene", "save_mesh_preview", "Visualizer",
           "VISBACKENDS", "BaseVisBackend", "LocalVisBackend",
           "TensorboardVisBackend", "WandbVisBackend", "MlflowVisBackend"]
