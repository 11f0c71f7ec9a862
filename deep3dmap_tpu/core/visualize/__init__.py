from .camera_scene import plot_camera_scene
from .mesh_viewer import save_mesh_preview

__all__ = ["plot_camera_scene", "save_mesh_preview"]
