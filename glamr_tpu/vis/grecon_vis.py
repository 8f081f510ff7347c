"""Global-recon result visualizer.

Reference: global_recon/vis/vis_grecon.py — renders the optimized world
scene (all persons + animated camera frustum from cam_pose_inv), the
camera view composited over the source video, and GT-vs-estimate
overlays; per-sequence render cameras come from vis_cfg
(global_recon/vis/vis_cfg.py:3-31).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .renderer import Camera, Visualizer3D
from .smpl_vis import SMPLActor, _COLORS
from .video import _read_video


def camera_frustum_segments(cam_pose_inv: np.ndarray, scale: float = 0.25):
    """Line segments of a camera frustum glyph for one cam->world pose
    (reference vis_grecon.py:316-325 animates a frustum mesh)."""
    origin = cam_pose_inv[:3, 3]
    R = cam_pose_inv[:3, :3]
    corners = np.array([[-1, -0.6, 1.5], [1, -0.6, 1.5],
                        [1, 0.6, 1.5], [-1, 0.6, 1.5]]) * scale
    corners = corners @ R.T + origin
    starts, ends = [], []
    for c in corners:
        starts.append(origin); ends.append(c)
    for i in range(4):
        starts.append(corners[i]); ends.append(corners[(i + 1) % 4])
    return np.stack(starts), np.stack(ends)


class GReconVisualizer(Visualizer3D):
    """Render an optimize() out_dict. Modes ('coord'):
      'world'        — world frame with camera frustum trail
      'cam_in_world' — view from the estimated camera, world content
      'cam'          — composited over the background video (if given)
    """

    def __init__(self, data: dict, smpl=None, coord: str = "world",
                 background_video: Optional[str] = None, align_gt: bool = False,
                 show_gt: bool = False, cam_pos=None, cam_focus=None, **kw):
        super().__init__(**kw)
        # per-sequence render camera (reference vis_cfg.py specs); None =
        # auto-frame at render time
        self.cam_pos, self.cam_focus = cam_pos, cam_focus
        self.data = data
        self.smpl = smpl
        self.coord = coord
        self.show_gt = show_gt
        self.num_fr = int(data["seq_len"])
        self.cam_pose = np.asarray(data["cam_pose"])          # (T, 4, 4)
        self.cam_pose_inv = np.asarray(data["cam_pose_inv"])
        self.bg_frames = None
        if background_video is not None and os.path.isfile(background_video):
            self.bg_frames, _ = _read_video(background_video)
        self._build_actors()

    def _build_actors(self):
        import jax.numpy as jnp

        self.actors = []
        for i, (pid, pd) in enumerate(self.data["person_data"].items()):
            out = self.smpl.forward(
                jnp.asarray(pd["smpl_orient_world"]),
                jnp.asarray(pd["smpl_pose"]),
                jnp.asarray(pd["smpl_beta"]),
                root_trans=jnp.asarray(pd["root_trans_world"]),
            )
            actor = SMPLActor(self.smpl.faces, _COLORS[i % len(_COLORS)])
            actor.set_sequence(np.asarray(out.vertices), pd.get("visible"))
            self.actors.append(actor)

    def update_scene(self, fr: int):
        if self.coord in ("cam", "cam_in_world"):
            pd0 = next(iter(self.data["person_data"].values()))
            K = np.asarray(pd0["cam_K"][min(fr, len(pd0["cam_K"]) - 1)])
            if K[0, 0] == 0:
                K = np.array([[1000.0, 0, self.width / 2],
                              [0, 1000.0, self.height / 2], [0, 0, 1]])
            self.camera = Camera.from_intrinsics(
                K, self.cam_pose[fr], self.width, self.height)
            if self.coord == "cam" and self.bg_frames is not None:
                self.background_img = self.bg_frames[min(fr, len(self.bg_frames) - 1)]
                self.show_ground = False
        for a in self.actors:
            a.submit(self, fr)
        if self.coord == "world":
            # camera frustum trail
            s, e = camera_frustum_segments(self.cam_pose_inv[fr])
            self.add_lines(s, e, (120, 200, 255), 2)

    def save_animation_as_video(self, out_path: str, fps: float = 30.0,
                                **kw) -> str:
        if self.coord == "world" and self.camera is None:
            if self.cam_pos is not None and self.cam_focus is not None:
                self.camera = Camera.lookat(
                    eye=np.asarray(self.cam_pos, np.float64),
                    target=np.asarray(self.cam_focus, np.float64),
                    width=self.width, height=self.height)
            else:
                # frame the scene: look at the mean person position
                centers = np.concatenate([
                    np.asarray(pd["root_trans_world"])
                    for pd in self.data["person_data"].values()])
                c = centers.mean(0)
                self.camera = Camera.lookat(eye=c + np.array([5.0, -5.0, 3.0]),
                                            target=c, width=self.width,
                                            height=self.height)
        return super().save_animation_as_video(out_path, self.num_fr, fps, **kw)
