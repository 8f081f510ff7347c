"""AMASS preprocessing: consolidated motion pickle -> training pickles.

Reference: preprocess/preprocess_amass.py + preprocess/amass_utils.py —
30 fps resampling, SMPL-H 156-D pose -> SMPL 72-D joint subset, per-seq
theta (T, 85) = [trans(3), pose(72), shape(10)] plus FK joint positions
with and without shape, train/test split. Outputs amass_{split}.pkl and
amass_{split}_jpos.pkl consumed by data.AMASSDataset.

The FK joint computation is batched jnp over all frames at once (the
reference chunks torch SMPL forwards at 2000 frames; a single fused XLA
call handles full sequences).
"""
from __future__ import annotations

import argparse
import os
import pickle
from typing import Optional

import numpy as np

# SMPL-H stores 52 joints x 3; SMPL's 24th joint (right_index1) is SMPL-H
# joint 37 (reference amass_utils.py:11-16)
_SMPLH_JOINTS = np.array(
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
     20, 21, 22, 37], dtype=np.int64)
SMPLH_TO_SMPL_CHANNELS = (np.arange(156).reshape(-1, 3)[_SMPLH_JOINTS]).reshape(-1)


def smplh_to_smpl_pose(poses: np.ndarray) -> np.ndarray:
    """(T, 156) SMPL-H axis-angle -> (T, 72) SMPL subset."""
    return poses[:, SMPLH_TO_SMPL_CHANNELS]


def resample_sequence(data: np.ndarray, source_fps: float,
                      target_fps: float) -> np.ndarray:
    """Linear time-resampling (reference amass_utils.py:19-38)."""
    if abs(source_fps - target_fps) < 0.1:
        return data
    T_src = data.shape[0]
    duration = T_src / source_fps
    T_tgt = max(int(round(duration * target_fps)), 2)
    t_src = np.linspace(0, duration, T_src)
    t_tgt = np.linspace(0, duration, T_tgt)
    flat = data.reshape(T_src, -1)
    out = np.empty((T_tgt, flat.shape[1]), flat.dtype)
    for c in range(flat.shape[1]):
        out[:, c] = np.interp(t_tgt, t_src, flat[:, c])
    return out.reshape((T_tgt,) + data.shape[1:])


_FK_CHUNK = 8192


def _fk_joints(smpl, pose: np.ndarray, shape: Optional[np.ndarray]) -> np.ndarray:
    """Body-local 24-joint positions (zero orient/trans), full LBS joints
    when shape given, template FK otherwise (amass_utils.py:41-66).

    Frames batch into large fixed chunks so a whole dataset's FK is a
    handful of dispatches instead of per-sequence eager chains (per-op
    dispatch dominated preprocessing for hundreds of sequences)."""
    import jax.numpy as jnp

    T = pose.shape[0]
    out = np.empty((T, smpl.model.num_joints, 3), np.float32)
    for s in range(0, T, _FK_CHUNK):
        e = min(s + _FK_CHUNK, T)
        zeros3 = jnp.zeros((e - s, 3), jnp.float32)
        body = jnp.asarray(pose[s:e, 3:], jnp.float32)
        if shape is None:
            joints = smpl.get_joints(zeros3, body, root_trans=zeros3)
        else:
            from ..body.lbs import lbs, reroot

            _, j24 = lbs(smpl.model, jnp.asarray(shape[s:e], jnp.float32),
                         jnp.concatenate([zeros3, body], axis=-1),
                         want_verts=False)
            joints = reroot(j24, j24, zeros3)
        out[s:e] = np.asarray(joints)[:, :out.shape[1]]
    return out


def process_amass(motions: list, smpl=None, source_fps: float = 60.0,
                  target_fps: float = 30.0, min_seq_len: int = 60,
                  train_ratio: float = 0.9, seed: int = 42):
    """motions: list of dicts with 'poses' (T,156) (or (T,72)), 'trans'
    (T,3), 'betas' (>=10,), optional 'mocap_framerate'/'name'.

    Returns (train, test, train_jpos, test_jpos) dicts.
    """
    from ..body.smpl import get_smpl

    smpl = smpl or get_smpl("body26fk")
    rng = np.random.default_rng(seed)
    data, jpos = {}, {}
    for i, m in enumerate(motions):
        name = m.get("name", f"seq_{i:05d}")
        fps = float(m.get("mocap_framerate", source_fps))
        poses = np.asarray(m["poses"], np.float32)
        if poses.shape[1] >= 156:
            poses = smplh_to_smpl_pose(poses)
        trans = np.asarray(m["trans"], np.float32)
        poses = resample_sequence(poses, fps, target_fps)
        trans = resample_sequence(trans, fps, target_fps)
        if poses.shape[0] < min_seq_len:
            continue
        betas = np.asarray(m["betas"], np.float32)[:10]
        shape = np.tile(betas[None], (poses.shape[0], 1))
        theta = np.concatenate([trans, poses, shape], axis=-1).astype(np.float32)
        data[name] = theta

    # FK for ALL sequences in one flat frame batch (chunked dispatches)
    if data:
        all_theta = np.concatenate(list(data.values()), axis=0)
        jp_all = _fk_joints(smpl, all_theta[:, 3:75], all_theta[:, 75:85])
        jp_ns_all = _fk_joints(smpl, all_theta[:, 3:75], None)
        off = 0
        for name, theta in data.items():
            t = theta.shape[0]
            jpos[name] = (jp_all[off: off + t], jp_ns_all[off: off + t])
            off += t

    names = list(data.keys())
    rng.shuffle(names)
    n_train = int(len(names) * train_ratio)
    train = {k: data[k] for k in names[:n_train]}
    test = {k: data[k] for k in names[n_train:]}
    train_jpos = {k: jpos[k] for k in train}
    test_jpos = {k: jpos[k] for k in test}
    return train, test, train_jpos, test_jpos


def read_raw_amass(folder: str, sequences: Optional[list] = None,
                   target_fps: float = 30.0) -> list:
    """Raw AMASS download layout -> motion dicts for process_amass.

    Reference: preprocess/amass_utils.py:149 read_data / read_sequence —
    the directory structure AMASS actually ships
    (`<root>/<dataset>/<subject>/<action>.npz`, each npz carrying
    'poses' (T,156 SMPL-H), 'trans' (T,3), 'betas', 'mocap_framerate';
    '*shape.npz' files skipped). Like the reference, frames are
    decimated with the integer stride `mocap_framerate // fps`
    (NOT linear interpolation), so the emitted dicts carry
    mocap_framerate == target_fps and process_amass's resampler is a
    no-op on them. Sequences shorter than 60 frames after decimation
    are dropped there; the same happens downstream via min_seq_len.
    """
    if sequences is None:
        sequences = sorted(
            d for d in os.listdir(folder)
            if os.path.isdir(os.path.join(folder, d)))
    motions = []
    for seq_name in sequences:
        seq_dir = os.path.join(folder, seq_name)
        subjects = sorted(
            s for s in os.listdir(seq_dir)
            if os.path.isdir(os.path.join(seq_dir, s)))
        for subject in subjects:
            sub_dir = os.path.join(seq_dir, subject)
            for action in sorted(os.listdir(sub_dir)):
                if not action.endswith(".npz") or action.endswith("shape.npz"):
                    continue
                with np.load(os.path.join(sub_dir, action)) as data:
                    if "poses" not in data or "mocap_framerate" not in data:
                        continue  # metadata npz (e.g. neutral_stagei)
                    fr = int(data["mocap_framerate"])
                    stride = max(fr // int(target_fps), 1)
                    motions.append({
                        "name": f"{seq_name}_{subject}_{action[:-4]}",
                        "poses": np.asarray(data["poses"][::stride],
                                            np.float32),
                        "trans": np.asarray(data["trans"][::stride],
                                            np.float32),
                        "betas": np.asarray(data["betas"], np.float32),
                        "mocap_framerate": float(target_fps),
                    })
    return motions


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--motions_pkl", default=None,
                        help="consolidated motions pickle (list of dicts)")
    parser.add_argument("--raw_dir", default=None,
                        help="raw AMASS download root "
                             "(<root>/<dataset>/<subject>/<action>.npz)")
    parser.add_argument("--sequences", default=None,
                        help="comma-separated dataset subdirs of --raw_dir "
                             "(default: all)")
    parser.add_argument("--output_path", default="datasets/amass_processed/v1")
    parser.add_argument("--source_fps", type=float, default=60.0)
    parser.add_argument("--target_fps", type=float, default=30.0)
    parser.add_argument("--min_seq_len", type=int, default=60)
    parser.add_argument("--train_ratio", type=float, default=0.9)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    if bool(args.motions_pkl) == bool(args.raw_dir):
        parser.error("exactly one of --motions_pkl / --raw_dir is required")
    if args.raw_dir:
        seqs = args.sequences.split(",") if args.sequences else None
        motions = read_raw_amass(args.raw_dir, seqs,
                                 target_fps=args.target_fps)
    else:
        with open(args.motions_pkl, "rb") as f:
            motions = pickle.load(f)
    train, test, train_jpos, test_jpos = process_amass(
        motions, source_fps=args.source_fps, target_fps=args.target_fps,
        min_seq_len=args.min_seq_len, train_ratio=args.train_ratio,
        seed=args.seed)
    os.makedirs(args.output_path, exist_ok=True)
    for split, d, jp in [("train", train, train_jpos), ("test", test, test_jpos)]:
        with open(os.path.join(args.output_path, f"amass_{split}.pkl"), "wb") as f:
            pickle.dump(d, f)
        with open(os.path.join(args.output_path, f"amass_{split}_jpos.pkl"), "wb") as f:
            pickle.dump(jp, f)
    print(f"wrote {len(train)} train / {len(test)} test sequences to "
          f"{args.output_path}")


if __name__ == "__main__":
    main()
