from .clipscore import CLIPScorer
from .mesh_render import render_mesh_views, kire_camera_rig

__all__ = ["CLIPScorer", "render_mesh_views", "kire_camera_rig"]
