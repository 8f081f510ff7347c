"""Per-sequence render-camera specs for the global-recon visualizer.

Mirrors the reference's demo_seq_render_specs registry
(global_recon/vis/vis_cfg.py:3-31): each entry pins the world-view render
camera ('cam_pos', 'cam_focus') for a named demo sequence so repeated
renders frame the scene identically. Sequences without an entry fall back
to 'default' (None = auto-framing from the mean person position,
vis/grecon_vis.py). Users add entries for their own videos here or pass
cam_pos/cam_focus to GReconVisualizer directly.
"""
from __future__ import annotations

from typing import Optional

demo_seq_render_specs: dict = {
    # auto-frame by default; named demo sequences can pin their camera:
    # 'my_video': {'cam_pos': (6.0, 0.1, 1.2), 'cam_focus': (0.0, 0.0, 0.8)},
    "default": None,
}


def get_render_spec(seq_name: str) -> Optional[dict]:
    return demo_seq_render_specs.get(seq_name,
                                     demo_seq_render_specs["default"])
