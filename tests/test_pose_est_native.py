"""In-framework pose estimation: analytic twist-swing IK + keypoint lifter
(replaces the HybrIK subprocess's regression core; reference pose_est/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glamr_tpu.body.lbs import lbs, rodrigues
from glamr_tpu.body.smpl import get_smpl
from glamr_tpu.pose_est.ik import (LEAF_JOINTS, NUM_TWISTS, _rot_between,
                                   hybrik, twist_angles)


@pytest.fixture(scope="module")
def smpl():
    return get_smpl("body26fk", synthetic=True)


def _random_pose(B, rng, scale=0.4):
    pose = rng.normal(0, scale, (B, 72)).astype(np.float32)
    for j in LEAF_JOINTS:  # leaf rotations are invisible to joint-position IK
        pose[:, 3 * j: 3 * j + 3] = 0.0
    return pose


class TestIK:
    def test_round_trip_recovers_pose(self, smpl):
        """hybrik(fk(pose), twist_angles(pose)) == pose (non-leaf joints),
        up to f32 accumulation down the 24-joint tree."""
        rng = np.random.default_rng(0)
        B = 16
        pose = _random_pose(B, rng)
        betas = rng.normal(0, 0.5, (B, 10)).astype(np.float32)
        _, joints = lbs(smpl.model, jnp.asarray(betas), jnp.asarray(pose),
                        want_verts=False)
        tw = twist_angles(smpl.model, jnp.asarray(pose), jnp.asarray(betas))
        rec = hybrik(smpl.model, joints, tw, jnp.asarray(betas))
        r1 = rodrigues(jnp.asarray(pose).reshape(B, 24, 3))
        r2 = rodrigues(rec.reshape(B, 24, 3))
        assert float(jnp.abs(r1 - r2).max()) < 2e-2
        _, joints2 = lbs(smpl.model, jnp.asarray(betas), rec, want_verts=False)
        assert float(jnp.abs(joints - joints2).max()) < 5e-3

    def test_swing_only_reaches_target_joints(self, smpl):
        """Without twist input the recovered pose differs, but the joint
        positions still match (twist is position-invisible)."""
        rng = np.random.default_rng(1)
        B = 8
        pose = _random_pose(B, rng)
        betas = jnp.zeros((B, 10))
        _, joints = lbs(smpl.model, betas, jnp.asarray(pose), want_verts=False)
        rec = hybrik(smpl.model, joints, None, betas)
        _, joints2 = lbs(smpl.model, betas, rec, want_verts=False)
        assert float(jnp.abs(joints - joints2).max()) < 5e-3

    def test_zero_pose_is_identity(self, smpl):
        B = 2
        pose = jnp.zeros((B, 72))
        _, joints = lbs(smpl.model, jnp.zeros((B, 10)), pose, want_verts=False)
        rec = hybrik(smpl.model, joints, None, None)
        assert float(jnp.abs(rec).max()) < 1e-3

    def test_twist_count(self):
        assert NUM_TWISTS == 17

    def test_rot_between_edge_cases(self):
        a = jnp.asarray(np.array([[0.0, 0, 1], [1, 0, 0], [0, 1, 0]]))
        # identity
        r = _rot_between(a, a)
        assert float(jnp.abs(r - jnp.eye(3)).max()) < 1e-6
        # antiparallel: proper rotation (det=1) taking a to -a
        r = _rot_between(a, -a)
        det = jnp.linalg.det(r)
        assert float(jnp.abs(det - 1.0).max()) < 1e-5
        assert float(jnp.abs(jnp.einsum("bij,bj->bi", r, a) + a).max()) < 1e-5

    def test_differentiable(self, smpl):
        """IK is a usable network head: gradients flow to the joints."""
        B = 2
        rng = np.random.default_rng(2)
        pose = _random_pose(B, rng, 0.2)
        _, joints = lbs(smpl.model, jnp.zeros((B, 10)), jnp.asarray(pose),
                        want_verts=False)

        def f(j):
            return jnp.sum(hybrik(smpl.model, j, None, None) ** 2)

        g = jax.grad(f)(joints)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestLifter:
    def _model(self):
        from glamr_tpu.pose_est.lifter import (KeypointLifter, LifterConfig,
                                               init_lifter)
        from glamr_tpu.train.trainer import make_tx

        cfg = LifterConfig(d_model=64, nhead=4, ff_dim=128, nlayer=1,
                           dropout=0.0)
        model = KeypointLifter(cfg)
        tx = make_tx(1e-3)
        state = init_lifter(model, tx, jax.random.PRNGKey(0), seq_len=8)
        return model, tx, state

    def test_forward_shapes(self):
        model, _, state = self._model()
        B, T = 3, 8
        kp = jnp.zeros((B, T, 24, 2))
        vis = jnp.ones((B, T, 24))
        out = model.apply(state.params, kp, vis)
        assert out["jpos_rel"].shape == (B, T, 24, 3)
        assert out["root_trans"].shape == (B, T, 3)
        assert out["twist"].shape == (B, T, NUM_TWISTS, 2)
        assert out["betas"].shape == (B, 10)
        # root-relative by construction; twist rows unit-norm; depth > 1
        assert float(jnp.abs(out["jpos_rel"][:, :, 0]).max()) == 0.0
        n = jnp.linalg.norm(out["twist"], axis=-1)
        assert float(jnp.abs(n - 1).max()) < 1e-4
        assert float(out["root_trans"][..., 2].min()) > 1.0

    def test_train_step_decreases_loss(self, smpl):
        from glamr_tpu.data.procedural import procedural_amass_data
        from glamr_tpu.pose_est.lifter import DEFAULT_LIFTER_LOSS_CFG
        from glamr_tpu.pose_est.synth import LifterDataGen
        from glamr_tpu.train import make_lifter_train_step

        model, tx, state = self._model()
        data, _, _, _ = procedural_amass_data(num_seqs=4, min_len=60,
                                              max_len=80, seed=0, smpl=smpl)
        gen = LifterDataGen(data, smpl, seq_len=8)
        rng = np.random.default_rng(0)
        batch = {k: jnp.asarray(v) for k, v in gen.batch(rng, 16).items()}
        step = make_lifter_train_step(model, tx, DEFAULT_LIFTER_LOSS_CFG)
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(30):
            key, sub = jax.random.split(key)
            state, m = step(state, batch, sub)
            losses.append(float(m["loss"]))
        assert losses[-1] < 0.5 * losses[0], losses[::10]

    def test_estimator_schema(self, smpl):
        """Untrained lifter still produces a schema-valid pose.pkl dict."""
        from glamr_tpu.pose_est.estimator import run_lifter_on_tracks

        model, _, state = self._model()
        rng = np.random.default_rng(0)
        Tv, num_fr = 10, 14
        K = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]],
                     np.float32)
        tracks = {
            0: {"kp_2d": rng.uniform(400, 1500, (num_fr, 24, 2)),
                "frames": np.arange(num_fr)},
            1: {"kp_2d": rng.uniform(400, 1500, (Tv, 24, 2)),
                "frames": np.arange(2, 2 + Tv),
                "conf": np.ones((Tv, 24), np.float32)},
        }
        est = run_lifter_on_tracks(tracks, K, num_fr, model=model,
                                   params=state.params, smpl=smpl)
        assert set(est) == {0, 1}
        assert est[1]["smpl_pose_quat_wroot"].shape == (Tv, 24, 3, 3)
        assert est[1]["root_trans"].shape == (Tv, 3)
        assert np.isfinite(est[1]["smpl_pose_quat_wroot"]).all()


class TestDepthSmoother:
    """Temporal depth bundling (estimator.smooth_root_depth): the
    monocular-depth random walk over long tracks is the measured e2e
    G-MPJPE driver (benchmarks/stage1_metrics.json)."""

    def _ray_points(self, z, rng, T):
        # smooth lateral path; ray direction varies per frame
        x = np.cumsum(rng.normal(0, 0.005, T)).astype(np.float32)
        y = 0.1 + 0.02 * np.sin(np.arange(T) / 9.0)
        return np.stack([x, y.astype(np.float32), z], -1)

    def test_noise_suppressed_ray_preserved(self):
        from glamr_tpu.pose_est.estimator import smooth_root_depth

        rng = np.random.default_rng(0)
        T = 240
        z_gt = 3.5 + 0.3 * np.sin(np.arange(T) / 40.0)  # slow true motion
        gt = self._ray_points(z_gt.astype(np.float32), rng, T)
        noisy = gt * (1 + rng.normal(0, 0.04, (T, 1))).astype(np.float32)

        sm = smooth_root_depth(noisy)
        err_in = np.abs(noisy[:, 2] - gt[:, 2]).mean()
        err_out = np.abs(sm[:, 2] - gt[:, 2]).mean()
        assert err_out < 0.5 * err_in, (err_in, err_out)
        # camera ray of every frame is preserved exactly
        np.testing.assert_allclose(sm[:, 0] / sm[:, 2],
                                   noisy[:, 0] / noisy[:, 2], rtol=1e-5)
        np.testing.assert_allclose(sm[:, 1] / sm[:, 2],
                                   noisy[:, 1] / noisy[:, 2], rtol=1e-5)

    def test_constant_depth_fixed_point(self):
        from glamr_tpu.pose_est.estimator import smooth_root_depth

        rng = np.random.default_rng(1)
        gt = self._ray_points(np.full(100, 4.2, np.float32), rng, 100)
        sm = smooth_root_depth(gt)
        np.testing.assert_allclose(sm, gt, atol=1e-4)

    def test_real_approach_motion_passes(self):
        # a person walking toward the camera (1.5 m/s at 30 fps) must not
        # be flattened by the smoother
        from glamr_tpu.pose_est.estimator import smooth_root_depth

        rng = np.random.default_rng(2)
        T = 90
        z = (6.0 - 0.05 * np.arange(T)).astype(np.float32)  # 6 m -> 1.5 m
        gt = self._ray_points(z, rng, T)
        sm = smooth_root_depth(gt)
        # interior tracks the ramp closely (endpoints may lag slightly)
        sl = slice(10, -10)
        assert np.abs(sm[sl, 2] - gt[sl, 2]).max() < 0.08

    def test_low_conf_frames_downweighted(self):
        from glamr_tpu.pose_est.estimator import smooth_root_depth

        rng = np.random.default_rng(3)
        T = 120
        gt = self._ray_points(np.full(T, 3.0, np.float32), rng, T)
        noisy = gt.copy()
        bad = slice(50, 60)
        noisy[bad, 2] *= 1.6                      # occluded-frame blowup
        conf = np.ones((T, 24), np.float32)
        conf[bad] = 0.05
        sm_w = smooth_root_depth(noisy, conf=conf)
        sm_u = smooth_root_depth(noisy)
        err_w = np.abs(sm_w[bad, 2] - gt[bad, 2]).mean()
        err_u = np.abs(sm_u[bad, 2] - gt[bad, 2]).mean()
        assert err_w < 0.5 * err_u, (err_w, err_u)

    def test_wired_into_lifter_pose_est(self, smpl):
        # plumbing: the track-level entry applies the smoother by default
        # and disables it with depth_smooth_lam=None
        import inspect

        from glamr_tpu.pose_est.estimator import lifter_pose_est

        sig = inspect.signature(lifter_pose_est)
        assert sig.parameters["depth_smooth_lam"].default == 25.0
