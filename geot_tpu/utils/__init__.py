from .vis3d import vis_points, vis_multi_points, save_ply

__all__ = ["vis_points", "vis_multi_points", "save_ply"]
