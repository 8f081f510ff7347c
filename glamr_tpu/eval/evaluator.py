"""Quantitative evaluator — the reference's metric contract, TPU-native.

Reference: global_recon/utils/evaluator.py. Metric registry
{PA-MPJPE[-vis/-invis], G-MPJPE, G-MPVE, ACCEL, sample_PA-MPJPE-invis},
H36M-regressor 15-joint protocol (pelvis-centered 14 joints), Procrustes
for PA, chunked first-frame-heading alignment every `align_freq` frames
for the global metrics, 3DPW world +90deg-x fix, multi-seed aggregation
(min over seeds for PA-MPJPE-invis and sample metrics, mean otherwise).

All per-sequence computation is batched jnp over [T, ...] arrays (SMPL
LBS over all frames at once); masks select vis/invis frames instead of
boolean indexing so shapes stay static.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..body.constants import H36M_TO_J15
from ..body.smpl import SMPL, get_smpl
from ..transforms import (
    angle_axis_to_quaternion,
    convert_traj_world2heading,
    quat_apply,
    quat_mul,
    quaternion_to_angle_axis,
    similarity_transform,
)
from ..utils.log_utils import create_logger
from ..utils.tools import AverageMeter


def _masked_mpjpe(jpos, gt_jpos, mask):
    """Mean over frames (masked) of per-frame mean joint distance, in mm."""
    dist = jnp.linalg.norm(jpos - gt_jpos, axis=-1).mean(-1)  # (T,)
    n = mask.sum()
    total = (dist * mask).sum() * 1000.0
    return float(total / jnp.maximum(n, 1)), int(n)


class Evaluator:
    def __init__(self, algo: str = "", dataset: str = "", log_file: str = "nofile",
                 align_freq: int = 250, compute_sample: bool = True,
                 smpl: Optional[SMPL] = None):
        self.algo = algo
        self.dataset = dataset
        self.align_freq = align_freq
        self.compute_sample = compute_sample
        self.log = create_logger(None if log_file == "nofile" else log_file)
        self.smpl = smpl or get_smpl("body26fk")
        self.J_regressor = self.smpl.model.j_regressor_h36m  # (17, V)
        self.metrics_name = ["PA-MPJPE", "PA-MPJPE-vis", "PA-MPJPE-invis",
                             "G-MPJPE", "G-MPVE", "ACCEL"]
        if compute_sample:
            self.metrics_name.append("sample_PA-MPJPE-invis")
        self.seed_min_metrics = ["PA-MPJPE-invis"]
        self.reset()

    def reset(self):
        self.metrics_dict_collection = {}
        self.acc_metrics_dict = {"metrics": defaultdict(AverageMeter)}

    # ------------------------------------------------------------ alignment

    def aligned_orient_trans(self, orient_aa: jnp.ndarray, trans: jnp.ndarray):
        """Chunked first-frame-heading alignment (reference :202-216):
        every align_freq frames re-anchor the trajectory at the chunk's
        first frame heading so drift does not dominate global metrics."""
        orient_q = angle_axis_to_quaternion(orient_aa)
        T = orient_q.shape[0]
        qs, ts = [], []
        for i in range(int(np.ceil(T / self.align_freq))):
            sind = i * self.align_freq - int(i > 0)
            eind = min((i + 1) * self.align_freq, T)
            q_a, t_a = convert_traj_world2heading(
                orient_q[sind:eind], trans[sind:eind], apply_base_orient_after=True
            )
            keep = int(i > 0)
            qs.append(q_a[keep:])
            ts.append(t_a[keep:])
        aligned_q = jnp.concatenate(qs)
        return quaternion_to_angle_axis(aligned_q), jnp.concatenate(ts)

    # ------------------------------------------------------------- prepare

    def _smpl_eval_arrays(self, orient, body_pose, betas, trans, scale=None):
        """SMPL fwd -> (eval_joints (T,14,3) pelvis-centered, eval_verts,
        raw verts) with the H36M 15-joint protocol (reference :256-311)."""
        out = self.smpl.forward(
            jnp.asarray(orient), jnp.asarray(body_pose), jnp.asarray(betas),
            root_trans=jnp.asarray(trans),
            root_scale=None if scale is None else jnp.asarray(scale),
        )
        joint_h36m = jnp.einsum("jv,tvc->tjc", self.J_regressor, out.vertices)
        joint_15 = joint_h36m[:, H36M_TO_J15]
        pelvis = (joint_15[:, [3]] + joint_15[:, [4]]) * 0.5
        return joint_15[:, 1:] - pelvis, out.vertices - pelvis, out.vertices, joint_15

    def _aligned_eval_arrays(self, orient, body_pose, betas, trans, scale=None):
        a_orient, a_trans = self.aligned_orient_trans(jnp.asarray(orient),
                                                      jnp.asarray(trans))
        out = self.smpl.forward(
            a_orient, jnp.asarray(body_pose), jnp.asarray(betas),
            root_trans=a_trans,
            root_scale=None if scale is None else jnp.asarray(scale),
        )
        joint_h36m = jnp.einsum("jv,tvc->tjc", self.J_regressor, out.vertices)
        joint_15 = joint_h36m[:, H36M_TO_J15]
        return joint_15[:, 1:], out.vertices

    def prepare_seq(self, data: dict) -> dict:
        """out_dict + gt -> per-person eval arrays + masks (reference
        prepare_seq :218-327). Returns {'est': {...}, 'gt': {...}} per id."""
        prepared = {}
        for idx, pd in data["person_data"].items():
            exist = np.asarray(pd["exist_frames"], bool)
            gt = data["gt"][idx]
            visible = np.asarray(pd["visible_orig"])[exist]
            vis = (visible == 1).astype(np.float32)
            invis = (visible == 0).astype(np.float32)

            # ---- GT
            gt_pose = np.asarray(gt["pose"], np.float32)[exist]
            gt_shape = np.asarray(gt["shape"], np.float32)
            if gt_shape.ndim == 1:
                gt_shape = np.tile(gt_shape[None], (gt_pose.shape[0], 1))
            else:
                gt_shape = gt_shape[exist]
            gt_orient = gt_pose[:, :3]
            gt_trans = np.asarray(gt["root_trans"], np.float32)[exist]
            if self.dataset.upper() == "3DPW":
                # 3DPW world is y-up: rotate +90deg about x (reference :250-254)
                q90 = angle_axis_to_quaternion(
                    jnp.array([np.pi * 0.5, 0.0, 0.0], jnp.float32)
                )
                oq = quat_mul(jnp.broadcast_to(q90, (gt_orient.shape[0], 4)),
                              angle_axis_to_quaternion(jnp.asarray(gt_orient)))
                gt_orient = np.asarray(quaternion_to_angle_axis(oq))
                gt_trans = np.asarray(
                    quat_apply(jnp.broadcast_to(q90, (gt_trans.shape[0], 4)),
                               jnp.asarray(gt_trans)))
            gt_ej, gt_ev, gt_verts, _ = self._smpl_eval_arrays(
                gt_orient, gt_pose[:, 3:], gt_shape, gt_trans)
            gt_aej, gt_aev = self._aligned_eval_arrays(
                gt_orient, gt_pose[:, 3:], gt_shape, gt_trans)

            # ---- estimate
            est_orient = np.asarray(pd["smpl_orient_world"], np.float32)[exist]
            est_pose = np.asarray(pd["smpl_pose"], np.float32)[exist]
            est_beta = np.asarray(pd["smpl_beta"], np.float32)[exist]
            est_trans = np.asarray(pd["root_trans_world"], np.float32)[exist]
            scale = pd.get("scale")
            scale = None if scale is None else np.asarray(scale)[exist]
            ej, ev, verts, _ = self._smpl_eval_arrays(
                est_orient, est_pose, est_beta, est_trans, scale)
            aej, aev = self._aligned_eval_arrays(
                est_orient, est_pose, est_beta, est_trans, scale)
            ej_pa = similarity_transform(ej, gt_ej)

            prepared[idx] = {
                "vis": vis, "invis": invis,
                "eval_joints": ej, "eval_joints_pa": ej_pa, "eval_verts": ev,
                "aligned_eval_joints": aej, "aligned_eval_verts": aev,
                "gt_eval_joints": gt_ej, "gt_eval_verts": gt_ev,
                "gt_aligned_eval_joints": gt_aej, "gt_aligned_eval_verts": gt_aev,
            }
        return prepared

    # ------------------------------------------------------------- metrics

    def _metric(self, prepared, key, gt_key, mode):
        total, n = 0.0, 0
        for p in prepared.values():
            mask = {"all": np.ones_like(p["vis"]), "vis": p["vis"],
                    "invis": p["invis"]}[mode]
            val, cnt = _masked_mpjpe(p[key], p[gt_key], jnp.asarray(mask))
            total += val * cnt
            n += cnt
        return (total / n if n > 0 else 0.0), n

    def _accel(self, prepared):
        total, n = 0.0, 0
        for p in prepared.values():
            j, g = p["eval_joints"], p["gt_eval_joints"]
            acc = j[:-2] - 2 * j[1:-1] + j[2:]
            gacc = g[:-2] - 2 * g[1:-1] + g[2:]
            dist = jnp.linalg.norm(acc - gacc, axis=-1).mean(-1)
            total += float(dist.sum()) * 1000.0
            n += dist.shape[0]
        return (total / n if n > 0 else 0.0), n

    def _sample_pa_invis(self, prepared):
        vals, n = [], 0
        for p in prepared.values():
            mask = p["invis"] > 0
            dist = np.asarray(
                jnp.linalg.norm(p["eval_joints_pa"] - p["gt_eval_joints"], axis=-1
                                ).mean(-1)) * 1000.0
            vals.append(dist[mask])
            n += int(mask.sum())
        return np.concatenate(vals) if vals else np.zeros(0), n

    def compute_sequence_metrics(self, data: dict, name=None, accumulate=True):
        import jax

        # float32 matmuls: metric-grade accuracy (TPU defaults to bf16)
        with jax.default_matmul_precision("float32"):
            prepared = self.prepare_seq(data)
        md = defaultdict(dict)
        md["seq_len"] = data.get("seq_len")
        M = md["metrics"]
        for mode, mname in [("all", "PA-MPJPE"), ("vis", "PA-MPJPE-vis"),
                            ("invis", "PA-MPJPE-invis")]:
            v, n = self._metric(prepared, "eval_joints_pa", "gt_eval_joints", mode)
            M[mname] = AverageMeter(v, n)
        v, n = self._metric(prepared, "aligned_eval_joints",
                            "gt_aligned_eval_joints", "all")
        M["G-MPJPE"] = AverageMeter(v, n)
        v, n = self._metric(prepared, "aligned_eval_verts",
                            "gt_aligned_eval_verts", "all")
        M["G-MPVE"] = AverageMeter(v, n)
        v, n = self._accel(prepared)
        M["ACCEL"] = AverageMeter(v, n)
        if self.compute_sample:
            v, n = self._sample_pa_invis(prepared)
            M["sample_PA-MPJPE-invis"] = AverageMeter(v, n)

        if accumulate:
            self.update_accumulated_metrics(md, name)
        return md

    def update_accumulated_metrics(self, metrics_dict, name=None):
        if name is not None:
            self.metrics_dict_collection[name] = metrics_dict
        for metric in self.metrics_name:
            m = metrics_dict["metrics"][metric]
            if not isinstance(m.avg, np.ndarray):
                self.acc_metrics_dict["metrics"][metric].update(m.avg, m.count)
        return self.acc_metrics_dict

    def metrics_from_multiple_seeds(self, metrics_dict_arr):
        """Min over seeds for PA-MPJPE-invis & sample metrics, mean for the
        rest (reference :352-376)."""
        md = defaultdict(dict)
        md["seq_len"] = metrics_dict_arr[0]["seq_len"]
        for metric in self.metrics_name:
            num = metrics_dict_arr[0]["metrics"][metric].count
            if "sample" in metric or "mean" in metric:
                if num == 0:
                    val = 0.0
                else:
                    arr = np.stack([x["metrics"][metric].avg for x in metrics_dict_arr])
                    val = (arr.min(axis=0) if "sample" in metric
                           else arr.mean(axis=0)).mean()
            else:
                arr = np.array([x["metrics"][metric].avg for x in metrics_dict_arr])
                val = arr.min() if metric in self.seed_min_metrics else arr.mean()
            md["metrics"][metric] = AverageMeter(val, num)
        return md

    def print_metrics(self, metrics_dict=None, fmt=".3f", prefix="",
                      print_accum=True):
        if metrics_dict is None:
            metrics_dict = self.acc_metrics_dict
        parts = []
        for x, y in metrics_dict["metrics"].items():
            if isinstance(y.avg, np.ndarray):
                continue
            parts.append(f"{x}: {y.avg:{fmt}}" + (f" ({y.val:{fmt}})" if print_accum else ""))
        self.log.info(f"{prefix}{self.algo} --- " + " ".join(parts))
