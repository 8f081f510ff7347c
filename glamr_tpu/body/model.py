"""SMPL body-model parameter container and loaders.

The model is a pytree of plain jnp arrays, so every body-model function is
a pure function of (model, inputs) — jit/vmap/shard-friendly, with the
parameters living in device HBM once.

Loads real SMPL model files (.npz or .pkl, as distributed by MPI) when
available; otherwise builds a fully self-consistent *synthetic* body model
with the true SMPL topology (24-joint tree, configurable vertex count) so
the entire pipeline — FK, LBS, regressors, rendering, metrics — runs and
is testable without the licensed artifacts. The synthetic model is
deterministic (seeded) so golden tests are stable.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C

SMPL_MODEL_DIR = os.environ.get("GLAMR_SMPL_DIR", "data/body_models/smpl")
JOINT_REGRESSOR_EXTRA = os.environ.get("GLAMR_JREG_EXTRA", "data/J_regressor_extra.npy")
JOINT_REGRESSOR_H36M = os.environ.get("GLAMR_JREG_H36M", "data/J_regressor_h36m.npy")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SMPLModel:
    """SMPL parameters as arrays. Shapes use V = num vertices, J = 24."""

    v_template: jax.Array          # (V, 3)
    shapedirs: jax.Array           # (V, 3, 10)
    posedirs: jax.Array            # (V, 3, 207)   pose-corrective blend shapes
    j_regressor: jax.Array         # (J, V)
    lbs_weights: jax.Array         # (V, J)
    parents: np.ndarray = field(metadata=dict(static=True))        # (J,) int
    landmark_vertex_ids: jax.Array  # (21,) vertex picks for extra landmarks
    j_regressor_extra: jax.Array   # (9, V)
    j_regressor_h36m: jax.Array    # (17, V)
    faces: np.ndarray = field(metadata=dict(static=True))          # (F, 3) int
    # True for the procedural stand-in model (no real SMPL asset on disk);
    # consumers that need a human-looking SILHOUETTE (detector training
    # renders) switch to the capsule body when this is set.
    synthetic: bool = field(default=False, metadata=dict(static=True))

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.j_regressor.shape[0]


def _as_np(x) -> np.ndarray:
    """Convert array-likes (incl. chumpy objects inside SMPL pkls) to numpy."""
    if hasattr(x, "r"):
        return np.asarray(x.r)
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray())
    return np.asarray(x)


# vertex ids smplx uses for the 21 extra landmarks on the real SMPL mesh
# (nose, eyes, ears, toes, heels, finger tips) — standard public constants.
_REAL_LANDMARK_VERTS = np.array(
    [332, 6260, 2800, 4071, 583, 3216, 3226, 3387, 6617, 6624, 6787,
     2746, 2319, 2445, 2556, 2673, 6191, 5782, 5905, 6016, 6133],
    dtype=np.int32,
)


def load_smpl(model_path: str | None = None) -> SMPLModel:
    """Load a real SMPL model (.npz or .pkl). Falls back to the synthetic
    model if the file is absent (so demos/tests run everywhere)."""
    path = model_path or SMPL_MODEL_DIR
    cand = []
    if os.path.isdir(path):
        cand = [os.path.join(path, f) for f in sorted(os.listdir(path))
                if f.lower().endswith((".npz", ".pkl"))]
    elif os.path.isfile(path):
        cand = [path]
    if not cand:
        return synthetic_smpl_model()

    f = cand[0]
    if f.endswith(".npz"):
        raw = dict(np.load(f, allow_pickle=True))
    else:
        with open(f, "rb") as fh:
            raw = pickle.load(fh, encoding="latin1")

    v_template = _as_np(raw["v_template"]).astype(np.float32)
    shapedirs = _as_np(raw["shapedirs"])[:, :, :10].astype(np.float32)
    posedirs = _as_np(raw["posedirs"]).astype(np.float32)
    if posedirs.ndim == 2:  # stored as (V*3, 207)
        posedirs = posedirs.reshape(v_template.shape[0], 3, -1)
    j_regressor = _as_np(raw["J_regressor"]).astype(np.float32)
    lbs_weights = _as_np(raw["weights"]).astype(np.float32)
    parents = _as_np(raw["kintree_table"])[0].astype(np.int32)
    parents[0] = -1
    faces = _as_np(raw["f"]).astype(np.int32)

    V = v_template.shape[0]
    jre = (np.load(JOINT_REGRESSOR_EXTRA).astype(np.float32)
           if os.path.isfile(JOINT_REGRESSOR_EXTRA)
           else np.zeros((C.NUM_EXTRA_JOINTS, V), np.float32))
    jrh = (np.load(JOINT_REGRESSOR_H36M).astype(np.float32)
           if os.path.isfile(JOINT_REGRESSOR_H36M)
           else np.zeros((17, V), np.float32))

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=parents,
        landmark_vertex_ids=jnp.asarray(_REAL_LANDMARK_VERTS % V),
        j_regressor_extra=jnp.asarray(jre),
        j_regressor_h36m=jnp.asarray(jrh),
        faces=faces,
    )


# canonical joint positions of a ~1.7 m human in the SMPL T-pose frame
# (y up, facing +z), used to seed the synthetic model's skeleton
_CANONICAL_JOINTS = np.array([
    [0.000, 0.000, 0.000],    # pelvis
    [0.070, -0.080, 0.000],   # left_hip
    [-0.070, -0.080, 0.000],  # right_hip
    [0.000, 0.110, -0.010],   # spine1
    [0.100, -0.480, 0.000],   # left_knee
    [-0.100, -0.480, 0.000],  # right_knee
    [0.000, 0.250, 0.000],    # spine2
    [0.090, -0.880, -0.030],  # left_ankle
    [-0.090, -0.880, -0.030], # right_ankle
    [0.000, 0.310, 0.010],    # spine3
    [0.110, -0.940, 0.090],   # left_foot
    [-0.110, -0.940, 0.090],  # right_foot
    [0.000, 0.500, -0.020],   # neck
    [0.070, 0.420, -0.010],   # left_collar
    [-0.070, 0.420, -0.010],  # right_collar
    [0.000, 0.580, 0.030],    # head
    [0.170, 0.450, -0.020],   # left_shoulder
    [-0.170, 0.450, -0.020],  # right_shoulder
    [0.430, 0.440, -0.030],   # left_elbow
    [-0.430, 0.440, -0.030],  # right_elbow
    [0.680, 0.440, -0.030],   # left_wrist
    [-0.680, 0.440, -0.030],  # right_wrist
    [0.760, 0.430, -0.030],   # left_hand
    [-0.760, 0.430, -0.030],  # right_hand
], dtype=np.float32)


def synthetic_smpl_model(num_verts: int = 1728, seed: int = 7) -> SMPLModel:
    """Deterministic synthetic SMPL-topology model.

    Vertices are scattered around bone segments; the joint regressor is
    constructed so that J_regressor @ v_template == canonical joints exactly
    (self-consistency the real model also satisfies), and LBS weights are
    softmax-by-distance over the two nearest joints.
    """
    rng = np.random.default_rng(seed)
    J = C.NUM_SMPL_JOINTS
    joints = _CANONICAL_JOINTS

    # scatter vertices around bones: each vertex belongs to a joint segment
    per_joint = num_verts // J
    owner = np.repeat(np.arange(J), per_joint)
    owner = np.concatenate([owner, rng.integers(0, J, num_verts - owner.size)])
    parents = C.SMPL_PARENTS
    pj = np.where(parents[owner] >= 0, parents[owner], owner)
    t = rng.uniform(0, 1, (num_verts, 1)).astype(np.float32)
    centers = joints[owner] * t + joints[pj] * (1 - t)
    v_template = centers + rng.normal(0, 0.05, (num_verts, 3)).astype(np.float32)

    # regressor: average of the vertices owned by each joint, then correct the
    # residual so the regressed joints land exactly on the canonical skeleton
    j_regressor = np.zeros((J, num_verts), np.float32)
    for j in range(J):
        idx = np.where(owner == j)[0]
        j_regressor[j, idx] = 1.0 / len(idx)
    # rank-correct: add a per-joint affine fix spread over the owned verts
    reg_joints = j_regressor @ v_template
    for j in range(J):
        idx = np.where(owner == j)[0]
        delta = joints[j] - reg_joints[j]
        # shift the owned vertices' template so the average is exact
        v_template[idx] += delta

    # LBS weights: softmax over distance to the two nearest joints
    d = np.linalg.norm(v_template[:, None, :] - joints[None], axis=-1)
    w = np.exp(-d / 0.08)
    # keep only top-2 joints per vertex (real SMPL is similarly sparse)
    top2 = np.argsort(d, axis=1)[:, :2]
    mask = np.zeros_like(w)
    np.put_along_axis(mask, top2, 1.0, axis=1)
    w = w * mask
    lbs_weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    shapedirs = rng.normal(0, 0.01, (num_verts, 3, 10)).astype(np.float32)
    posedirs = rng.normal(0, 0.002, (num_verts, 3, 9 * (J - 1))).astype(np.float32)

    landmark_ids = rng.choice(num_verts, C.NUM_VERTEX_LANDMARKS, replace=False).astype(np.int32)
    jre = np.zeros((C.NUM_EXTRA_JOINTS, num_verts), np.float32)
    for j in range(C.NUM_EXTRA_JOINTS):
        idx = rng.choice(num_verts, 6, replace=False)
        jre[j, idx] = 1.0 / 6
    jrh = np.zeros((17, num_verts), np.float32)
    for j in range(17):
        idx = rng.choice(num_verts, 6, replace=False)
        jrh[j, idx] = 1.0 / 6

    # simple triangulation over consecutive vertex triples (placeholder mesh)
    faces = np.stack([
        np.arange(0, num_verts - 2), np.arange(1, num_verts - 1),
        np.arange(2, num_verts),
    ], axis=-1).astype(np.int32)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=parents,
        landmark_vertex_ids=jnp.asarray(landmark_ids),
        j_regressor_extra=jnp.asarray(jre),
        j_regressor_h36m=jnp.asarray(jrh),
        faces=faces,
        synthetic=True,
    )
