"""Visualization: video utils, 3D renderer, SMPL/skeleton actors, global
recon scenes. CPU-side product features (reference renders with
pyvista/VTK + ffmpeg; this stack renders with matplotlib/cv2 so it works
in minimal environments, with the same APIs)."""
from .video import (
    frames_to_video,
    video_to_frames,
    hstack_videos,
    vstack_videos,
    draw_bbox,
    draw_text,
    resize_bbox,
)
from .renderer import Visualizer3D
from .smpl_vis import SkeletonActor, SMPLActor, SMPLVisualizer
from .grecon_vis import GReconVisualizer
from .interactive import export_html, save_interactive_html, show_interactive

__all__ = [k for k in dir() if not k.startswith("_")]
