"""Evaluator tests: metric zero on identical est/gt, sensitivity to
perturbation, multi-seed aggregation (min/mean rules)."""
import numpy as np
import pytest

from glamr_tpu.body import get_smpl
from glamr_tpu.eval import Evaluator


def make_eval_data(rng, T=40, perturb=0.0, dataset=""):
    """Minimal out_dict+gt pair with matching world motion."""
    pose = rng.normal(0, 0.15, (T, 72)).astype(np.float32)
    pose[:, :3] += np.array([1.2092, 1.2092, 1.2092], np.float32)
    trans = np.cumsum(rng.normal(0, 0.01, (T, 3)), 0).astype(np.float32)
    trans[:, 2] += 0.9
    shape = rng.normal(0, 0.3, (10,)).astype(np.float32)
    visible = np.ones(T, np.float32)
    visible[15:20] = 0

    est_pose = pose.copy()
    est_trans = trans.copy()
    if perturb:
        est_pose = est_pose + rng.normal(0, perturb, est_pose.shape).astype(np.float32)
        est_trans = est_trans + rng.normal(0, perturb, est_trans.shape).astype(np.float32)

    person = {
        "exist_frames": np.ones(T, bool),
        "visible_orig": visible,
        "smpl_orient_world": est_pose[:, :3],
        "smpl_pose": est_pose[:, 3:],
        "smpl_beta": np.tile(shape[None], (T, 1)),
        "root_trans_world": est_trans,
        "scale": None,
    }
    gt = {"pose": pose, "shape": shape, "root_trans": trans}
    return {
        "person_data": {0: person},
        "gt": {0: gt},
        "gt_meta": {},
        "seq_len": T,
    }


@pytest.fixture(scope="module")
def evaluator():
    return Evaluator(algo="test", smpl=get_smpl("body26fk", synthetic=True))


class TestEvaluator:
    def test_zero_on_identical(self, evaluator):
        data = make_eval_data(np.random.default_rng(0))
        md = evaluator.compute_sequence_metrics(data, accumulate=False)
        m = md["metrics"]
        assert m["PA-MPJPE"].avg < 1e-2          # mm
        assert m["G-MPJPE"].avg < 1e-2
        assert m["G-MPVE"].avg < 1e-2
        assert m["ACCEL"].avg < 1e-2
        assert m["PA-MPJPE-invis"].count == 5

    def test_perturbation_increases_error(self, evaluator):
        d0 = make_eval_data(np.random.default_rng(1))
        d1 = make_eval_data(np.random.default_rng(1), perturb=0.05)
        m0 = evaluator.compute_sequence_metrics(d0, accumulate=False)["metrics"]
        m1 = evaluator.compute_sequence_metrics(d1, accumulate=False)["metrics"]
        assert m1["PA-MPJPE"].avg > m0["PA-MPJPE"].avg
        assert m1["G-MPJPE"].avg > 1.0  # perturbation in meters -> mm error

    def test_3dpw_world_rotation(self, evaluator):
        """3DPW mode applies the +90deg-x world fix to GT only; an estimate
        already in z-up world must then show a large orientation gap, and
        identical inputs under dataset='' must not."""
        ev3 = Evaluator(algo="t", dataset="3DPW",
                        smpl=get_smpl("body26fk", synthetic=True))
        data = make_eval_data(np.random.default_rng(2))
        m3 = ev3.compute_sequence_metrics(data, accumulate=False)["metrics"]
        m0 = evaluator.compute_sequence_metrics(
            make_eval_data(np.random.default_rng(2)), accumulate=False)["metrics"]
        # PA metric is rotation-invariant -> unchanged; G-MPJPE differs
        assert abs(m3["PA-MPJPE"].avg - m0["PA-MPJPE"].avg) < 1e-3

    def test_multi_seed_aggregation(self, evaluator):
        mds = []
        for seed in range(3):
            d = make_eval_data(np.random.default_rng(10), perturb=0.01 * (seed + 1))
            mds.append(evaluator.compute_sequence_metrics(d, accumulate=False))
        agg = evaluator.metrics_from_multiple_seeds(mds)["metrics"]
        vals = [md["metrics"]["PA-MPJPE-invis"].avg for md in mds]
        assert agg["PA-MPJPE-invis"].avg == pytest.approx(min(vals))
        vals_all = [md["metrics"]["PA-MPJPE"].avg for md in mds]
        assert agg["PA-MPJPE"].avg == pytest.approx(np.mean(vals_all))
        # sample metric: min over seeds per frame, then mean
        assert np.isscalar(agg["sample_PA-MPJPE-invis"].avg) or \
            agg["sample_PA-MPJPE-invis"].avg.ndim == 0

    def test_accumulation(self):
        ev = Evaluator(algo="t", smpl=get_smpl("body26fk", synthetic=True))
        for seed in range(2):
            d = make_eval_data(np.random.default_rng(seed), perturb=0.02)
            ev.compute_sequence_metrics(d, name=f"seq{seed}")
        acc = ev.acc_metrics_dict["metrics"]
        assert acc["PA-MPJPE"].count > 0
        ev.print_metrics()
