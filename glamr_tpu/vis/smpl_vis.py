"""SMPL mesh / skeleton actors + AMASS sequence visualizer.

Reference: motion_infiller/vis/vis_smpl.py (SMPLActor:16, SkeletonActor:42,
SMPLVisualizer:114) — pyvista actors there; draw-call submitters for the
software renderer here, same roles: render gt / recon / sample motion
side-by-side with occlusion opacity.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..body.constants import SMPL_PARENTS
from .renderer import Visualizer3D

_COLORS = [(90, 160, 255), (255, 140, 90), (120, 220, 120), (230, 110, 230),
           (250, 210, 90), (140, 140, 255)]


class SMPLActor:
    """Per-person posed mesh (reference vis_smpl.py:16-40)."""

    def __init__(self, faces: np.ndarray, color=(180, 180, 200)):
        self.faces = np.asarray(faces)
        self.color = color
        self.verts: Optional[np.ndarray] = None   # (T, V, 3)
        self.visible: Optional[np.ndarray] = None  # (T,) 1/0

    def set_sequence(self, verts: np.ndarray, visible=None):
        self.verts = np.asarray(verts)
        self.visible = visible

    def submit(self, vis: Visualizer3D, fr: int):
        if self.verts is None or fr >= len(self.verts):
            return
        opacity = 1.0
        if self.visible is not None and not self.visible[fr]:
            opacity = 0.45  # occluded frames render translucent (:30-38)
        vis.add_mesh(self.verts[fr], self.faces, self.color, opacity)


class SkeletonActor:
    """Bone-segment skeleton (reference vis_smpl.py:42-112 renders oriented
    cylinders; line segments here)."""

    def __init__(self, edges: Optional[Sequence] = None, color=(255, 90, 90),
                 joint_color=(255, 200, 80)):
        if edges is None:
            edges = [(j, int(p)) for j, p in enumerate(SMPL_PARENTS) if p >= 0]
        self.edges = np.asarray(edges)
        self.color = color
        self.joint_color = joint_color
        self.joints: Optional[np.ndarray] = None   # (T, J, 3)
        self.visible: Optional[np.ndarray] = None

    def set_sequence(self, joints: np.ndarray, visible=None):
        self.joints = np.asarray(joints)
        self.visible = visible

    def submit(self, vis: Visualizer3D, fr: int):
        if self.joints is None or fr >= len(self.joints):
            return
        j = self.joints[fr]
        vis.add_lines(j[self.edges[:, 0]], j[self.edges[:, 1]], self.color, 2)
        vis.add_points(j, self.joint_color, 3)


class SMPLVisualizer(Visualizer3D):
    """Render one or more motion versions (gt / recon / sample) side by
    side in world space (reference SMPLVisualizer :114-284)."""

    def __init__(self, smpl=None, show_smpl: bool = True,
                 show_skeleton: bool = False, **kw):
        super().__init__(**kw)
        self.smpl = smpl
        self.show_smpl = show_smpl and smpl is not None
        self.show_skeleton = show_skeleton or smpl is None
        self.mesh_actors: list[SMPLActor] = []
        self.skel_actors: list[SkeletonActor] = []
        self.num_fr = 0

    def set_motions(self, motions: Sequence[dict], offset_x: float = 1.2):
        """motions: list of dicts with 'orient' (T,3), 'body_pose' (T,69),
        'betas' (T,10), 'trans' (T,3), optional 'visible' (T,). Each motion
        is offset along +x so versions render side-by-side."""
        import jax.numpy as jnp

        self.mesh_actors, self.skel_actors = [], []
        for i, m in enumerate(motions):
            T = len(m["trans"])
            self.num_fr = max(self.num_fr, T)
            offset = np.array([offset_x * i, 0.0, 0.0], np.float32)
            color = _COLORS[i % len(_COLORS)]
            if self.show_smpl:
                out = self.smpl.forward(
                    jnp.asarray(m["orient"]), jnp.asarray(m["body_pose"]),
                    jnp.asarray(m["betas"]),
                    root_trans=jnp.asarray(m["trans"]),
                )
                actor = SMPLActor(self.smpl.faces, color)
                actor.set_sequence(np.asarray(out.vertices) + offset,
                                   m.get("visible"))
                self.mesh_actors.append(actor)
                joints = np.asarray(out.joints24)
            else:
                out = None
                joints = None
            if self.show_skeleton:
                if joints is None:
                    joints = self.smpl_joints(m)
                sk = SkeletonActor(color=color)
                sk.set_sequence(joints + offset, m.get("visible"))
                self.skel_actors.append(sk)

    def smpl_joints(self, m):
        import jax.numpy as jnp
        return np.asarray(self.smpl.get_joints(
            jnp.asarray(m["orient"]), jnp.asarray(m["body_pose"]),
            root_trans=jnp.asarray(m["trans"])))

    def update_scene(self, fr: int):
        for a in self.mesh_actors:
            a.submit(self, fr)
        for a in self.skel_actors:
            a.submit(self, fr)
