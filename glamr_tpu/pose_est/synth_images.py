"""Synthetic rendered images for detector training.

Renders procedurally-generated SMPL bodies (data/procedural.py) through
random cameras with the software rasterizer — random backgrounds, colors,
multi-person layouts — and emits CenterNet-style training targets for
pose_est/detector.py. This mirrors the reference's data-level synthesis
strategy (synthetic occlusion masks amass_dataset.py:93-110, synthetic
dynamic cameras preprocess_h36m_occluded.py): no licensed image dataset
is required to train the in-framework stage-1 detector.
"""
from __future__ import annotations

import cv2
import numpy as np

from .detector import DetectorConfig, splat_gaussian
from .synth import lookat_cam


# SMPL kinematic-tree part groups (joint index -> part id). Used to give
# synthetic bodies clothing-like per-part colors so the detector cannot
# key on "uniform-color blob" — the round-2 flat-color renders produced a
# detector that scored ~0.03 on real footage (textured people).
_PART_OF_JOINT = np.array([
    1,          # 0 pelvis        -> torso
    4, 5,       # 1/2 hips        -> L/R leg
    1,          # 3 spine1        -> torso
    4, 5,       # 4/5 knees       -> L/R leg
    1,          # 6 spine2        -> torso
    4, 5,       # 7/8 ankles      -> L/R leg
    1,          # 9 spine3        -> torso
    4, 5,       # 10/11 feet      -> L/R leg
    0,          # 12 neck         -> head
    1, 1,       # 13/14 collars   -> torso
    0,          # 15 head         -> head
    2, 3,       # 16/17 shoulders -> L/R arm
    2, 3,       # 18/19 elbows    -> L/R arm
    2, 3,       # 20/21 wrists    -> L/R arm
    2, 3,       # 22/23 hands     -> L/R arm
], np.int32)
_NUM_PARTS = 6


def part_palette(rng: np.random.Generator) -> np.ndarray:
    """(_NUM_PARTS, 3) clothing-like part colors in 0-255: skin for the
    head, one color for torso+arms ("shirt"), one for legs ("pants"),
    with per-limb jitter so limbs still separate visually."""
    skin = np.array([0.8, 0.6, 0.5]) * rng.uniform(0.5, 1.25)
    shirt = rng.uniform(0.1, 0.95, 3)
    pants = rng.uniform(0.1, 0.95, 3)
    if rng.uniform() < 0.2:
        # dark low-contrast outfit (black hoodie / dark tracksuit): the
        # failure case measured on the basketball demo's second person
        shirt = rng.uniform(0.02, 0.18, 3)
        pants = rng.uniform(0.02, 0.18, 3)
    cols = np.zeros((_NUM_PARTS, 3))
    cols[0] = skin                                   # head
    cols[1] = shirt                                  # torso
    cols[2] = np.clip(shirt + rng.normal(0, 0.06, 3), 0, 1)  # L arm
    cols[3] = np.clip(shirt + rng.normal(0, 0.06, 3), 0, 1)  # R arm
    cols[4] = np.clip(pants + rng.normal(0, 0.06, 3), 0, 1)  # L leg
    cols[5] = np.clip(pants + rng.normal(0, 0.06, 3), 0, 1)  # R leg
    if rng.uniform() < 0.2:                          # plain single color
        cols[:] = rng.uniform(0.15, 0.95, 3)
    return np.clip(cols, 0, 1) * 255.0


def face_part_colors(lbs_weights: np.ndarray, faces: np.ndarray,
                     rng: np.random.Generator) -> np.ndarray:
    """(F, 3) clothing-like per-face colors from skinning weights.

    Vertices are assigned to the part of their max-weight joint; a face
    takes its first vertex's part.
    """
    J = lbs_weights.shape[1]
    part_of_joint = _PART_OF_JOINT[:J] if J <= 24 else np.concatenate(
        [_PART_OF_JOINT, np.full(J - 24, 1, np.int32)])
    vert_part = part_of_joint[np.argmax(lbs_weights, axis=1)]     # (V,)
    face_part = vert_part[faces[:, 0]]                            # (F,)
    return part_palette(rng)[face_part]


# (child_joint, radius_m) for each bone of the capsule body; the bone runs
# parent(child) -> child in the SMPL kinematic tree.
_CAPSULE_RADIUS = {
    1: 0.09, 2: 0.09,        # pelvis -> hips (fills the hip girdle)
    3: 0.11, 6: 0.12, 9: 0.12,   # spine column (torso girth)
    4: 0.07, 5: 0.07,        # hip -> knee
    7: 0.055, 8: 0.055,      # knee -> ankle
    10: 0.04, 11: 0.04,      # ankle -> foot
    12: 0.05,                # spine3 -> neck
    13: 0.055, 14: 0.055,    # neck -> collars
    15: 0.085,               # neck -> head (extended: skull)
    16: 0.055, 17: 0.055,    # collar -> shoulder
    18: 0.045, 19: 0.045,    # shoulder -> elbow
    20: 0.04, 21: 0.04,      # elbow -> wrist
    22: 0.035, 23: 0.035,    # wrist -> hand
}


def capsule_body_mesh(joints: np.ndarray, parents: np.ndarray,
                      radius_scale: float = 1.0, nseg: int = 8):
    """Solid humanoid mesh from 24 posed joints: one closed tube per bone.

    The procedural stand-in SMPL model's placeholder triangulation renders
    as spiky noise, nothing like a human SILHOUETTE — a detector trained
    on it scores ~0.03 on real footage. Capsules around the posed skeleton
    give real-shaped silhouettes from joints alone (no SMPL asset needed).

    Returns (verts (V, 3), faces (F, 3), face_part (F,) int).
    """
    all_v, all_f, all_p = [], [], []
    base = 0
    ang = np.linspace(0, 2 * np.pi, nseg, endpoint=False)
    unit_ring = np.stack([np.cos(ang), np.sin(ang)], axis=1)   # (n, 2)
    for child, r in _CAPSULE_RADIUS.items():
        p = joints[parents[child]].astype(np.float64)
        q = joints[child].astype(np.float64)
        if child == 15:  # extend past the head joint to cover the skull
            q = q + (q - p) * 1.4
        axis = q - p
        ln = np.linalg.norm(axis)
        if ln < 1e-6:
            continue
        axis /= ln
        # orthonormal frame around the bone
        ref = np.array([1.0, 0.0, 0.0]) if abs(axis[0]) < 0.9 \
            else np.array([0.0, 1.0, 0.0])
        u = np.cross(axis, ref); u /= np.linalg.norm(u)
        w = np.cross(axis, u)
        rr = r * radius_scale
        ring = unit_ring[:, :1] * u[None] * rr + unit_ring[:, 1:] * w[None] * rr
        # slightly overlap the parent joint so adjacent bones fuse
        v = np.concatenate([
            (p - 0.3 * rr * axis)[None] + ring,   # ring at parent end
            (q + 0.3 * rr * axis)[None] + ring,   # ring at child end
            (p - 0.8 * rr * axis)[None],          # parent cap apex
            (q + 0.8 * rr * axis)[None],          # child cap apex
        ])
        f = []
        for i in range(nseg):
            j = (i + 1) % nseg
            f.append([i, j, nseg + i])            # side quad, tri 1
            f.append([j, nseg + j, nseg + i])     # side quad, tri 2
            f.append([j, i, 2 * nseg])            # parent cap fan
            f.append([nseg + i, nseg + j, 2 * nseg + 1])  # child cap fan
        all_v.append(v.astype(np.float32))
        all_f.append(np.asarray(f, np.int32) + base)
        all_p.append(np.full(len(f), _PART_OF_JOINT[child], np.int32))
        base += len(v)
    return (np.concatenate(all_v), np.concatenate(all_f),
            np.concatenate(all_p))


def _tube_mesh(p: np.ndarray, q: np.ndarray, r: float, nseg: int = 8):
    """Closed tube from p to q with radius r -> (verts, faces)."""
    p, q = np.asarray(p, np.float64), np.asarray(q, np.float64)
    axis = q - p
    ln = np.linalg.norm(axis)
    axis = axis / max(ln, 1e-6)
    ref = np.array([1.0, 0, 0]) if abs(axis[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(axis, ref); u /= np.linalg.norm(u)
    w = np.cross(axis, u)
    ang = np.linspace(0, 2 * np.pi, nseg, endpoint=False)
    ring = np.cos(ang)[:, None] * u[None] * r + np.sin(ang)[:, None] * w[None] * r
    v = np.concatenate([p[None] + ring, q[None] + ring, p[None], q[None]])
    f = []
    for i in range(nseg):
        j = (i + 1) % nseg
        f += [[i, j, nseg + i], [j, nseg + j, nseg + i],
              [j, i, 2 * nseg], [nseg + i, nseg + j, 2 * nseg + 1]]
    return v.astype(np.float32), np.asarray(f, np.int32)


def _box_mesh(center: np.ndarray, half: np.ndarray):
    """Axis-aligned box -> (verts, faces)."""
    c, h = np.asarray(center, np.float32), np.asarray(half, np.float32)
    sgn = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                    for z in (-1, 1)], np.float32)
    v = c[None] + sgn * h[None]
    f = np.asarray([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                    [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                    [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def structure_meshes(rng: np.random.Generator, n: int, area: float = 3.5):
    """Person-scale NON-person structures as hard negatives: poles,
    boards, and pole+board combos (the basketball-hoop shape measured as
    a persistent mid-score false positive on the reference demo clip).
    Rendered with NO keypoint/center labels, they teach the detector's
    center head that vertical structures are not people.
    Returns a list of (verts, faces, colors) render_meshes entries.
    """
    out = []
    for _ in range(n):
        x, y = rng.uniform(-area, area, 2)
        kind = rng.choice(["pole", "board", "hoop"])
        col = (np.tile(rng.uniform(0.05, 0.9, 3), (1, 1)) * 255.0)
        if kind == "pole":
            htop = rng.uniform(1.2, 3.0)
            v, f = _tube_mesh([x, y, 0], [x, y, htop],
                              rng.uniform(0.03, 0.12))
            out.append((v, f, np.tile(col, (len(f), 1))))
        elif kind == "board":
            hz = rng.uniform(0.6, 2.4)
            half = np.array([rng.uniform(0.25, 0.7),
                             rng.uniform(0.02, 0.1),
                             rng.uniform(0.3, 0.7)], np.float32)
            v, f = _box_mesh([x, y, hz], half)
            out.append((v, f, np.tile(col, (len(f), 1))))
        else:  # pole with a board on top, hoop/sign-like
            htop = rng.uniform(1.8, 3.0)
            v1, f1 = _tube_mesh([x, y, 0], [x, y, htop],
                                rng.uniform(0.04, 0.1))
            v2, f2 = _box_mesh([x, y + rng.uniform(-0.2, 0.2), htop],
                               np.array([rng.uniform(0.3, 0.6), 0.04,
                                         rng.uniform(0.2, 0.45)],
                                        np.float32))
            v = np.concatenate([v1, v2])
            f = np.concatenate([f1, f2 + len(v1)])
            cols = np.concatenate([np.tile(col, (len(f1), 1)),
                                   np.tile(rng.uniform(0.05, 0.9, 3)[None]
                                           * 255.0, (len(f2), 1))])
            out.append((v, f, cols))
    return out


def person_mesh(smpl, verts: np.ndarray, joints: np.ndarray,
                rng: np.random.Generator, lbs_weights: np.ndarray = None):
    """One person's render mesh (verts, faces, colors (F, 3) 0-255): the
    real SMPL surface when a real model is loaded, else a capsule body
    posed by the FK joints. Pass a host-cached `lbs_weights` to avoid a
    device->host transfer per rendered person."""
    if getattr(smpl.model, "synthetic", False):
        cverts, cfaces, cpart = capsule_body_mesh(
            joints, np.asarray(smpl.model.parents),
            radius_scale=float(rng.uniform(0.8, 1.25)))
        return cverts, cfaces, part_palette(rng)[cpart]
    faces = np.asarray(smpl.faces)
    if lbs_weights is None:
        lbs_weights = np.asarray(smpl.model.lbs_weights)
    cols = face_part_colors(lbs_weights, faces, rng)
    return verts, faces, cols


def random_background(size: int, rng: np.random.Generator) -> np.ndarray:
    """Cluttered procedural background, (size, size, 3) float32 [0, 1].

    Layers: base color, optional gradient, multi-scale value noise
    (upsampled random grids), and random rectangles/ellipses — real
    scenes are textured and full of person-sized high-contrast shapes,
    and the detector must learn body SHAPE, not flat-vs-nonflat.
    """
    base = rng.uniform(0.1, 0.9, 3)
    img = np.tile(base.astype(np.float32), (size, size, 1))
    if rng.uniform() < 0.5:  # gradient at a random orientation
        g = np.linspace(-0.2, 0.2, size, dtype=np.float32)
        img = img + (g[:, None, None] if rng.uniform() < 0.5
                     else g[None, :, None]) * rng.choice([-1.0, 1.0])
    if rng.uniform() < 0.7:  # value noise: 1-2 octaves of upsampled grids
        for _ in range(int(rng.integers(1, 3))):
            gsz = int(rng.integers(3, 17))
            grid = rng.uniform(-1, 1, (gsz, gsz, 3)).astype(np.float32)
            amp = rng.uniform(0.05, 0.25)
            img = img + amp * cv2.resize(grid, (size, size),
                                         interpolation=cv2.INTER_LINEAR)
    nshape = int(rng.integers(0, 14))
    for _ in range(nshape):
        col = rng.uniform(0, 1, 3).astype(float)
        x, y = rng.integers(0, size, 2)
        w, h = rng.integers(size // 16, size // 2, 2)
        if rng.uniform() < 0.5:
            cv2.rectangle(img, (int(x), int(y)), (int(x + w), int(y + h)),
                          col.tolist(), -1)
        else:
            cv2.ellipse(img, (int(x), int(y)), (int(w // 2), int(h // 2)),
                        float(rng.uniform(0, 180)), 0, 360, col.tolist(), -1)
    img += rng.normal(0, rng.uniform(0.005, 0.05), img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


def render_meshes(meshes, cam_R, cam_c, K, size, rng: np.random.Generator):
    """Z-buffer render of colored meshes over a random cluttered background
    (shared fragment rasterizer, vis/renderer.py mesh_fragments — one code
    path with the product visualizer, pixel-exact depth between persons).

    meshes: list of (verts (V, 3) world, faces (F, 3), colors (3,) or
    (F, 3) 0-255). Returns (size, size, 3) float32 in [0, 1].
    """
    from ..vis.renderer import mesh_fragments, resolve_fragments

    img = random_background(size, rng)

    frags = []
    for verts, faces, color in meshes:
        vc = verts @ cam_R.T + (-cam_R @ cam_c)
        z = vc[:, 2]
        uv = ((vc / np.maximum(z[:, None], 1e-6)) @ K.T)[:, :2]
        f = mesh_fragments(uv, z, verts, faces, color,
                           size, size, cam_R[2])
        if f is not None:
            frags.append(f)
    img8 = (img * 255).astype(np.uint8)
    if frags:
        col, zbuf = resolve_fragments(
            tuple(np.concatenate(x) for x in zip(*frags)), size, size)
        cover = np.isfinite(zbuf)
        img8[cover] = col[cover]
    return img8.astype(np.float32) / 255.0


def render_mesh_image(verts_list, faces, cam_R, cam_c, K, size,
                      rng: np.random.Generator, lbs_weights=None):
    """Back-compat wrapper over render_meshes: one shared `faces` for all
    persons, random flat color per person (or part colors from
    lbs_weights (V, J))."""
    meshes = []
    for verts in verts_list:
        color = (face_part_colors(lbs_weights, faces, rng)
                 if lbs_weights is not None
                 else rng.uniform(0.15, 0.95, 3) * 255)
        meshes.append((verts, faces, color))
    return render_meshes(meshes, cam_R, cam_c, K, size, rng)


def occlude_and_blur(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random foreground occluder shapes + optional blur; the input array
    is never mutated (a copy is returned even when no-op draws fire).
    Models real-footage partial occlusion and motion blur."""
    img = img.copy()
    size = img.shape[0]
    if rng.uniform() < 0.3:
        for _ in range(int(rng.integers(1, 4))):
            col = rng.uniform(0, 1, 3).astype(float)
            x, y = rng.integers(0, size, 2)
            w, h = rng.integers(size // 12, size // 3, 2)
            cv2.rectangle(img, (int(x), int(y)), (int(x + w), int(y + h)),
                          col.tolist(), -1)
    if rng.uniform() < 0.3:
        k = int(rng.choice([3, 5]))
        img = cv2.GaussianBlur(img, (k, k), 0)
    return img


def letterbox_content(img: np.ndarray, kp: np.ndarray,
                      rng: np.random.Generator, K: np.ndarray = None):
    """Match the inference-time input distribution: detect_video
    letterboxes real frames to the square input by scaling the long side
    and zero-filling the rest (estimator.py detect_video) — a 720p video
    occupies only the top 56% of the 128 px input. With prob 0.6, squash
    the rendered content to a random aspect and paste at the top-left
    over black, updating keypoints (and, when given, the intrinsics K)
    to match the emitted image.
    """
    if K is not None:
        K = K.copy()
    if rng.uniform() >= 0.6:
        return img, kp, K
    size = img.shape[0]
    aspect = float(rng.uniform(0.5, 1.0))
    out = np.zeros_like(img)
    kp = kp.copy()
    if rng.uniform() < 0.8:       # landscape video: content fills top rows
        nh = max(int(round(size * aspect)), 8)
        out[:nh] = cv2.resize(img, (size, nh))
        kp[..., 1] *= nh / size
        if K is not None:
            K[1] *= nh / size     # fy, cy follow the row rescale
    else:                         # portrait: content fills left columns
        nw = max(int(round(size * aspect)), 8)
        out[:, :nw] = cv2.resize(img, (nw, size))
        kp[..., 0] *= nw / size
        if K is not None:
            K[0] *= nw / size     # fx, cx follow the column rescale
    return out, kp, K


class DetectorDataGen:
    """Multi-person rendered-image sampler with CenterNet targets.

    data: {seq_name: theta (T, 85)} AMASS-format motion (procedural or
    real). Each sample draws 1..max_people persons at random frames,
    places them near a shared look-at target, renders, and projects the
    24 SMPL joints for targets.
    """

    def __init__(self, data: dict, smpl=None, cfg: DetectorConfig = None):
        import jax

        from ..body.smpl import get_smpl

        self.smpl = smpl or get_smpl("body26fk")
        self.cfg = cfg or DetectorConfig()
        self.thetas = list(data.values())
        self._lbs_fn = None
        self._jax = jax
        self._lbs_weights = np.asarray(self.smpl.model.lbs_weights)

    def _verts_joints(self, pose72, beta):
        """(N, 72), (N, 10) -> world verts (N, V, 3), joints (N, 24, 3)
        (model frame; caller adds placement)."""
        import jax
        import jax.numpy as jnp

        from ..body.lbs import lbs

        if self._lbs_fn is None:
            from ..utils.cache import host_cpu_device

            model = self.smpl.model

            def f(pose, beta):
                return lbs(model, beta, pose)

            # pin via committed inputs when a CPU backend is registered
            # (tiny batched host-prep op; jit(backend=...) is deprecated
            # on jax 0.9 — input placement decides the backend instead)
            self._lbs_dev = host_cpu_device()
            self._lbs_fn = jax.jit(f)
        args = (jnp.asarray(pose72), jnp.asarray(beta))
        if self._lbs_dev is not None:
            args = jax.device_put(args, self._lbs_dev)
        v, j = self._lbs_fn(*args)
        return np.asarray(v), np.asarray(j)

    def sample(self, rng: np.random.Generator) -> dict:
        c = self.cfg
        size, hm, s = c.img_size, c.hm_size, c.out_stride
        K = c.num_kp
        # 1..max_people-1 persons; 10% person-free scenes so the detector
        # learns to stay silent on pure background (clutter/curtain folds
        # otherwise score as "most person-like thing in frame")
        NP = 0 if rng.uniform() < 0.1 else int(rng.integers(1, c.max_people))

        # draw NP random frames (padded LBS batch keeps one compiled shape)
        pose = np.zeros((c.max_people, 72), np.float32)
        beta = np.zeros((c.max_people, 10), np.float32)
        for i in range(NP):
            th = self.thetas[int(rng.integers(len(self.thetas)))]
            fr = th[int(rng.integers(th.shape[0]))]
            pose[i] = fr[3:75]
            beta[i] = fr[75:85]
        verts, joints = self._verts_joints(pose, beta)

        # world placement: persons spread around the origin — wide enough
        # that far-apart people land near the frame edges (the basketball
        # demo's standing coach is ~5 m from the dribbler)
        offsets = np.zeros((NP, 3), np.float32)
        offsets[:, :2] = rng.uniform(-2.5, 2.5, (NP, 2))
        verts = verts[:NP] + offsets[:, None]
        joints = joints[:NP] + offsets[:, None]

        # camera looking near (not at) the group center: look-at jitter
        # moves persons off-center toward the frame edges
        center = (joints[:, 0].mean(axis=0) if NP
                  else np.array([0.0, 0.0, 1.0]))
        az = rng.uniform(0, 2 * np.pi)
        dist = rng.uniform(2.5, 9.0)
        height = rng.uniform(0.6, 2.2)
        pos = np.array([center[0] + dist * np.cos(az),
                        center[1] + dist * np.sin(az), height])
        R, cpos = lookat_cam(pos, center + rng.normal(0, 0.4, 3))
        f = size * rng.uniform(0.9, 1.4)
        Kmat = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]],
                        np.float32)

        meshes = [person_mesh(self.smpl, verts[p], joints[p], rng,
                              lbs_weights=self._lbs_weights)
                  for p in range(NP)]
        # hard negatives: person-scale pole/board/hoop structures with NO
        # labels — the detector must stay silent on them (measured FP on
        # the reference basketball demo's hoop)
        if rng.uniform() < 0.5:
            meshes += structure_meshes(rng, int(rng.integers(1, 3)))
        img = render_meshes(meshes, R, cpos, Kmat, size, rng)

        # project joints -> pixel keypoints + targets
        jc = np.einsum("ij,pnj->pni", R, joints - cpos)
        kp = np.einsum("ij,pnj->pni", Kmat, jc / np.maximum(jc[..., 2:], 1e-6)
                       )[..., :2]                               # (NP, 24, 2)
        vis = ((jc[..., 2] > 0.05) & (kp[..., 0] >= 0) & (kp[..., 0] < size)
               & (kp[..., 1] >= 0) & (kp[..., 1] < size)).astype(np.float32)

        # image-domain randomization AFTER projecting: occluders + blur in
        # the content area, then inference-matching letterbox (kp follow)
        img = occlude_and_blur(img, rng)
        img, kp, Kmat = letterbox_content(img, kp, rng, Kmat)

        M = c.max_people
        gt_center_idx = np.zeros((M, 2), np.int32)
        gt_kp_offset = np.zeros((M, K, 2), np.float32)
        gt_kp_vis = np.zeros((M, K), np.float32)
        gt_person_mask = np.zeros(M, np.float32)
        centers_cell = []
        kp_cells_all, kp_vis_all = [], []
        for p in range(NP):
            cc = kp[p, 0] / s                       # pelvis cell (x, y)
            if not (0 <= cc[0] < hm and 0 <= cc[1] < hm):
                continue
            cy, cx = int(cc[1]), int(cc[0])
            gt_center_idx[p] = (cy, cx)
            gt_person_mask[p] = 1.0
            gt_kp_vis[p] = vis[p]
            gt_kp_offset[p] = kp[p] / s - np.array([cx, cy], np.float32)
            # peak at the floored cell — must coincide with gt_center_idx
            # (offsets carry the sub-cell residual, CenterNet convention)
            centers_cell.append((cy, cx))
            kp_cells_all.append(kp[p] / s)
            kp_vis_all.append(vis[p])

        sigma = max(hm / 24.0, 1.0)
        gt_center_hm = splat_gaussian(hm, centers_cell, sigma)
        gt_kp_hm = np.zeros((hm, hm, K), np.float32)
        if kp_cells_all:
            # vectorized multi-person gaussian splat: (Pv, K, h, w) -> max.
            # kp_sigma_cells > 0 keeps CONTINUOUS sub-cell peak positions
            # at that sigma (decode-snapping evidence); 0 = the legacy v3
            # recipe (cell-rounded peaks, sigma hm/24) the shipped release
            # trained with — see detector.DetectorConfig.kp_sigma_cells
            # for the measured outcomes of the sharper recipes.
            kp_sigma = getattr(c, "kp_sigma_cells", 0.0) or sigma
            kc = np.stack(kp_cells_all)                    # (Pv, K, 2) x,y
            if not getattr(c, "kp_sigma_cells", 0.0):
                kc = np.round(kc)
            vm = np.stack(kp_vis_all)                      # (Pv, K)
            yy, xx = np.mgrid[0:hm, 0:hm].astype(np.float32)
            d2 = (yy[None, None] - kc[..., 1, None, None]) ** 2 \
                + (xx[None, None] - kc[..., 0, None, None]) ** 2
            g = np.exp(-d2 / (2 * kp_sigma ** 2)) * vm[..., None, None]
            gt_kp_hm = g.max(axis=0).transpose(1, 2, 0).astype(np.float32)

        return {
            "images": img,
            "gt_center_hm": gt_center_hm,
            "gt_kp_hm": gt_kp_hm,
            "gt_center_idx": gt_center_idx,
            "gt_kp_offset": gt_kp_offset,
            "gt_kp_vis": gt_kp_vis,
            "gt_person_mask": gt_person_mask,
            "gt_kp_2d": (kp * vis[..., None]).astype(np.float32)
            if NP == M else np.concatenate(
                [kp * vis[..., None],
                 np.zeros((M - NP, K, 2), np.float32)]).astype(np.float32),
            "cam_K": Kmat,
        }

    def batch(self, rng: np.random.Generator, batch_size: int) -> dict:
        samples = [self.sample(rng) for _ in range(batch_size)]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def build_detector_pool(gen: DetectorDataGen, rng: np.random.Generator,
                        num_images: int, workers: int = None) -> dict:
    """Pre-render a fixed detector training pool for device-resident
    fused-epoch training (the detector analog of data/device_sampler.py:
    rendering is host-bound at ~25 ms/image, so per-step fresh renders
    cap training at ~1 step/s regardless of device speed; a pooled
    dataset renders once, lives in HBM, and epochs run at device speed
    with on-device photometric augmentation re-diversifying each draw).

    Images and heatmaps are quantized to uint8 (4x HBM saving; they are
    [0, 1] by construction) and dequantized on-device per batch.
    """
    import concurrent.futures as cf
    import os as _os

    workers = workers or min(8, _os.cpu_count() or 1)
    seeds = rng.integers(0, 2 ** 31 - 1, num_images)
    gen.sample(np.random.default_rng(0))  # warm the jitted LBS once

    def one(seed):
        return gen.sample(np.random.default_rng(int(seed)))

    if workers > 1:
        with cf.ThreadPoolExecutor(workers) as ex:
            samples = list(ex.map(one, seeds))
    else:
        samples = [one(s) for s in seeds]
    pool = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    for k in ("images", "gt_center_hm", "gt_kp_hm"):
        pool[k] = np.round(pool[k] * 255).astype(np.uint8)
    return pool
