"""Unit tests for the transforms core: round-trips and scipy ground truth."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from glamr_tpu import transforms as T


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    # canonicalize w >= 0 to avoid double-cover ambiguity in comparisons
    q *= np.sign(q[:, :1] + 1e-12)
    return q.astype(np.float32)


def scipy_from_wxyz(q):
    return R.from_quat(np.roll(q, -1, axis=-1))  # scipy is xyzw


class TestQuatAlgebra:
    def test_quat_mul_matches_scipy(self, rng):
        a, b = random_quats(rng, 50), random_quats(rng, 50)
        got = np.asarray(T.quat_mul(jnp.array(a), jnp.array(b)))
        want = scipy_from_wxyz(a) * scipy_from_wxyz(b)
        want_q = np.roll(want.as_quat(), 1, axis=-1)
        # compare up to sign
        sign = np.sign(np.sum(got * want_q, axis=-1, keepdims=True))
        np.testing.assert_allclose(got, sign * want_q, atol=1e-5)

    def test_quat_apply_matches_matrix(self, rng):
        q = random_quats(rng, 20)
        v = rng.normal(size=(20, 3)).astype(np.float32)
        got = np.asarray(T.quat_apply(jnp.array(q), jnp.array(v)))
        want = scipy_from_wxyz(q).apply(v)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_conjugate_is_inverse(self, rng):
        q = random_quats(rng, 10)
        prod = np.asarray(T.quat_mul(jnp.array(q), T.quat_conjugate(jnp.array(q))))
        np.testing.assert_allclose(prod[:, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(prod[:, 1:], 0.0, atol=1e-5)

    def test_quat_angle_diff(self, rng):
        q = random_quats(rng, 10)
        self_diff = np.asarray(T.quat_angle_diff(jnp.array(q), jnp.array(q)))
        assert np.all(self_diff < 2e-3)

    def test_quat_between_two_vec(self, rng):
        v1 = rng.normal(size=(30, 3)).astype(np.float32)
        v2 = rng.normal(size=(30, 3)).astype(np.float32)
        v1 /= np.linalg.norm(v1, axis=-1, keepdims=True)
        v2 /= np.linalg.norm(v2, axis=-1, keepdims=True)
        q = T.quat_between_two_vec(jnp.array(v1), jnp.array(v2))
        got = np.asarray(T.quat_apply(q, jnp.array(v1)))
        np.testing.assert_allclose(got, v2, atol=1e-4)
        # anti-parallel case
        q = T.quat_between_two_vec(jnp.array(v1), jnp.array(-v1))
        got = np.asarray(T.quat_apply(q, jnp.array(v1)))
        np.testing.assert_allclose(got, -v1, atol=1e-4)


class TestConversions:
    def test_aa_quat_roundtrip(self, rng):
        # keep |aa| < pi: beyond that the shortest-arc inverse wraps by 2*pi
        aa = rng.normal(size=(50, 3)).astype(np.float32)
        aa *= (0.98 * np.pi / np.maximum(np.linalg.norm(aa, axis=-1, keepdims=True), np.pi)).astype(np.float32)
        back = np.asarray(T.quaternion_to_angle_axis(T.angle_axis_to_quaternion(jnp.array(aa))))
        np.testing.assert_allclose(back, aa, atol=1e-4)

    def test_aa_quat_matches_scipy(self, rng):
        aa = (rng.normal(size=(50, 3)) * 1.2).astype(np.float32)
        got = np.asarray(T.angle_axis_to_quaternion(jnp.array(aa)))
        want = np.roll(R.from_rotvec(aa).as_quat(), 1, axis=-1)
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got, sign * want, atol=1e-5)

    def test_aa_zero_is_identity(self):
        q = np.asarray(T.angle_axis_to_quaternion(jnp.zeros((1, 3))))
        np.testing.assert_allclose(q, [[1.0, 0, 0, 0]], atol=1e-7)
        aa = np.asarray(T.quaternion_to_angle_axis(jnp.array([[1.0, 0, 0, 0]])))
        np.testing.assert_allclose(aa, 0.0, atol=1e-7)

    def test_quat_rotmat_roundtrip(self, rng):
        q = random_quats(rng, 50)
        m = T.quaternion_to_rotation_matrix(jnp.array(q))
        np.testing.assert_allclose(
            np.asarray(m), scipy_from_wxyz(q).as_matrix(), atol=1e-5
        )
        back = np.asarray(T.rotation_matrix_to_quaternion(m))
        sign = np.sign(np.sum(back * q, axis=-1, keepdims=True))
        np.testing.assert_allclose(back, sign * q, atol=1e-4)

    def test_rot6d_roundtrip(self, rng):
        aa = rng.normal(size=(40, 3)).astype(np.float32)
        aa *= (0.98 * np.pi / np.maximum(np.linalg.norm(aa, axis=-1, keepdims=True), np.pi)).astype(np.float32)
        six = T.angle_axis_to_rot6d(jnp.array(aa))
        back = np.asarray(T.rot6d_to_angle_axis(six))
        np.testing.assert_allclose(back, aa, atol=2e-4)

    def test_rot6d_gram_schmidt_valid(self, rng):
        noisy = rng.normal(size=(20, 6)).astype(np.float32)
        m = np.asarray(T.rot6d_to_rotmat(jnp.array(noisy)))
        eye = np.einsum("bij,bkj->bik", m, m)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)

    def test_euler_roundtrip(self, rng):
        angles = (rng.uniform(-1.2, 1.2, size=(30, 3))).astype(np.float32)
        q = T.quat_from_ypr_euler(jnp.array(angles))
        back = np.asarray(T.ypr_euler_from_quat(q))
        np.testing.assert_allclose(back, angles, atol=1e-4)


class TestHeading:
    def test_heading_decomposition(self, rng):
        q = random_quats(rng, 30)
        qj = jnp.array(q)
        hq = T.get_heading_q(qj)
        local = T.deheading_quat(qj, hq)
        recomposed = np.asarray(T.quat_mul(hq, local))
        sign = np.sign(np.sum(recomposed * q, axis=-1, keepdims=True))
        np.testing.assert_allclose(recomposed, sign * q, atol=1e-5)
        # heading quat has no x/y components
        np.testing.assert_allclose(np.asarray(hq)[:, 1:3], 0.0, atol=1e-6)

    def test_heading_vec_roundtrip(self, rng):
        theta = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3, size=(40,)).astype(np.float32)
        back = np.asarray(T.vec_to_heading(T.heading_to_vec(jnp.array(theta))))
        np.testing.assert_allclose(back, theta, atol=1e-5)

    def test_heading_to_quat(self):
        q = np.asarray(T.heading_to_quat(jnp.array([np.pi / 2], dtype=jnp.float32)))
        want = np.roll(R.from_euler("z", [90], degrees=True).as_quat(), 1, axis=-1)
        np.testing.assert_allclose(q.reshape(-1), want.reshape(-1), atol=1e-5)


class TestTransforms4x4:
    def test_make_inverse(self, rng):
        aa = rng.normal(size=(10, 3)).astype(np.float32)
        t = rng.normal(size=(10, 3)).astype(np.float32)
        M = T.make_transform(jnp.array(aa), jnp.array(t), rot_type="axis_angle")
        Minv = T.inverse_transform(M)
        prod = np.asarray(jnp.einsum("bij,bjk->bik", M, Minv))
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)

    def test_transform_trans_rot(self, rng):
        aa = rng.normal(size=(5, 3)).astype(np.float32)
        t = rng.normal(size=(5, 3)).astype(np.float32)
        pts = rng.normal(size=(5, 7, 3)).astype(np.float32)
        M = T.make_transform(jnp.array(aa), jnp.array(t), rot_type="axis_angle")
        got = np.asarray(T.transform_trans(M, jnp.array(pts)))
        want = np.einsum("bij,bnj->bni", R.from_rotvec(aa).as_matrix(), pts) + t[:, None]
        np.testing.assert_allclose(got, want, atol=1e-4)

        rot2 = rng.normal(size=(5, 3)).astype(np.float32)
        got_rot = np.asarray(T.transform_rot(M, jnp.array(rot2)))
        want_rot = (R.from_rotvec(aa) * R.from_rotvec(rot2)).as_rotvec()
        np.testing.assert_allclose(got_rot, want_rot, atol=1e-4)

    def test_procrustes_recovers_similarity(self, rng):
        S1 = rng.normal(size=(4, 14, 3)).astype(np.float32)
        rot = R.from_rotvec(rng.normal(size=(4, 3))).as_matrix().astype(np.float32)
        scale = rng.uniform(0.5, 2.0, size=(4, 1, 1)).astype(np.float32)
        trans = rng.normal(size=(4, 1, 3)).astype(np.float32)
        S2 = scale * np.einsum("bij,bnj->bni", rot, S1) + trans
        aligned = np.asarray(T.similarity_transform(jnp.array(S1), jnp.array(S2)))
        np.testing.assert_allclose(aligned, S2, atol=1e-3)


class TestTrajCodec:
    def _random_traj(self, rng, batch, t):
        trans = rng.normal(size=batch + (t, 3)).astype(np.float32) * 2
        aa = rng.normal(size=batch + (t, 3)).astype(np.float32)
        q = np.asarray(T.angle_axis_to_quaternion(jnp.array(aa)))
        return jnp.array(trans), jnp.array(q)

    def test_roundtrip_identity(self, rng):
        trans, q = self._random_traj(rng, (), 60)
        local = T.traj_global2local_heading(trans, q)
        assert local.shape == (60, 11)
        trans2, q2 = T.traj_local2global_heading(local)
        np.testing.assert_allclose(np.asarray(trans2), np.asarray(trans), atol=2e-3)
        dq = np.asarray(T.quat_angle_diff(q2, q))
        assert np.all(dq < 5e-3)

    def test_roundtrip_batched(self, rng):
        trans, q = self._random_traj(rng, (3,), 40)
        local = T.traj_global2local_heading(trans, q)
        assert local.shape == (3, 40, 11)
        trans2, q2 = T.traj_local2global_heading(local)
        np.testing.assert_allclose(np.asarray(trans2), np.asarray(trans), atol=2e-3)

    def test_padding_property(self, rng):
        """Identity-padded prefix decodes to the same trajectory on real frames."""
        from glamr_tpu.transforms.traj import pad_local_traj_span

        trans, q = self._random_traj(rng, (), 30)
        local = np.asarray(T.traj_global2local_heading(trans, q))
        pad = 7
        padded = pad_local_traj_span(local, pad, pad + 30)
        trans_p, q_p = T.traj_local2global_heading(jnp.array(padded))
        np.testing.assert_allclose(np.asarray(trans_p)[pad:], np.asarray(trans), atol=2e-3)
        dq = np.asarray(T.quat_angle_diff(q_p[pad:], q))
        assert np.all(dq < 5e-3)

    def test_world2heading_first_frame_canonical(self, rng):
        trans, q = self._random_traj(rng, (), 25)
        oh, th = T.convert_traj_world2heading(q, trans)
        # first frame xy must be at origin, first-frame heading removed
        np.testing.assert_allclose(np.asarray(th)[0, :2], 0.0, atol=1e-5)
        h0 = np.asarray(T.get_heading(oh))[0]
        assert abs(h0) < 1e-3

    def test_world2heading_roundtrip(self, rng):
        trans, q = self._random_traj(rng, (), 25)
        oh, th = T.convert_traj_world2heading(q, trans)
        init_heading_q = T.get_init_heading_q(q[:1])
        ow, tw = T.convert_traj_heading2world(oh, th, init_heading_q, trans[:1])
        np.testing.assert_allclose(np.asarray(tw), np.asarray(trans), atol=1e-4)
        dq = np.asarray(T.quat_angle_diff(ow, q))
        assert np.all(dq < 5e-3)

    def test_interp_orient_sep_heading(self, rng):
        # drop middle frames of a smooth trajectory; interp should land close
        t = 30
        theta = np.linspace(0, 1.0, t).astype(np.float32)
        aa = np.stack([theta * 0.3, theta * 0.2, theta], axis=-1)
        q = np.asarray(T.angle_axis_to_quaternion(jnp.array(aa)))
        vis = np.ones(t, dtype=bool)
        vis[10:20] = False
        out = T.interp_orient_q_sep_heading(q[vis], vis)
        dq = np.asarray(T.quat_angle_diff(jnp.array(out), jnp.array(q)))
        assert np.all(dq < 0.1)

    def test_interp_linear_extrap_matches_scipy(self, rng):
        from scipy.interpolate import interp1d

        vis = np.sort(rng.choice(50, size=12, replace=False))
        vals = rng.normal(size=(12, 4)).astype(np.float32)
        got = T.interp_linear_extrap(vis, vals, 50)
        f = interp1d(vis.astype(np.float64), vals, axis=0, fill_value="extrapolate")
        np.testing.assert_allclose(got, f(np.arange(50)), atol=1e-4)


class TestNumericalEdges:
    """Rotation-conversion edge cases: theta near 0, near pi, exact
    identity — where naive formulas produce NaNs or large errors."""

    def test_identity_roundtrips(self):
        import jax.numpy as jnp
        from glamr_tpu.transforms import (
            angle_axis_to_quaternion, quaternion_to_angle_axis,
            angle_axis_to_rotation_matrix, rotation_matrix_to_angle_axis)

        aa = jnp.zeros((3, 3))
        q = angle_axis_to_quaternion(aa)
        np.testing.assert_allclose(np.asarray(q),
                                   np.tile([1, 0, 0, 0], (3, 1)), atol=1e-6)
        back = quaternion_to_angle_axis(q)
        np.testing.assert_allclose(np.asarray(back), 0.0, atol=1e-6)
        R = angle_axis_to_rotation_matrix(aa)
        aa2 = rotation_matrix_to_angle_axis(R)
        assert np.isfinite(np.asarray(aa2)).all()

    def test_near_pi_rotations(self, rng):
        import jax.numpy as jnp
        from glamr_tpu.transforms import (
            angle_axis_to_rotation_matrix, rotation_matrix_to_angle_axis)
        from scipy.spatial.transform import Rotation as R

        axes = rng.normal(0, 1, (16, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        for theta in [np.pi - 1e-4, np.pi - 1e-6, np.pi]:
            aa = (axes * theta).astype(np.float32)
            Rm = np.asarray(angle_axis_to_rotation_matrix(jnp.asarray(aa)))
            want = R.from_rotvec(aa).as_matrix()
            np.testing.assert_allclose(Rm, want, atol=1e-4)
            back = np.asarray(rotation_matrix_to_angle_axis(jnp.asarray(Rm)))
            # axis-angle is double-covered near pi: compare rotations
            got = R.from_rotvec(back).as_matrix()
            np.testing.assert_allclose(got, want, atol=5e-3)

    def test_tiny_rotations_gradient_safe(self):
        """Gradients of the conversions at theta -> 0 must be finite (the
        optimizer differentiates through orientation residuals near 0)."""
        import jax
        import jax.numpy as jnp
        from glamr_tpu.transforms import (
            angle_axis_to_quaternion, quaternion_to_angle_axis)

        def f(aa):
            return (quaternion_to_angle_axis(
                angle_axis_to_quaternion(aa)) ** 2).sum()

        for scale in [1e-3, 1e-5, 0.0]:
            g = jax.grad(f)(jnp.full((3,), scale))
            assert np.isfinite(np.asarray(g)).all(), scale


class TestTrajSoA:
    def test_channel_codec_matches_aos(self, rng):
        """transforms.traj_soa channel codec == the AoS codec (rot6d ->
        quat via Gram-Schmidt+Shepperd, heading integration, quat->aa).
        Measured as NOT profitable inside the recon scan for (P, T)
        channel shapes (lane padding there is only ~2.5x and the extra
        slice/stack traffic dominates — unlike the trailing-3x3 body
        math); kept as the validated building block for layouts where a
        bigger axis lands on lanes."""
        import jax.numpy as jnp

        from glamr_tpu.transforms import (quaternion_to_angle_axis,
                                          rot6d_to_quat)
        from glamr_tpu.transforms.traj import traj_local2global_heading
        from glamr_tpu.transforms.traj_soa import (
            quat_to_aa_ch, rot6d_to_quat_ch, traj_local2global_heading_ch)

        P, T = 3, 41
        tl = rng.normal(0, 0.5, (P, T, 11)).astype(np.float32)
        tl[..., 9:11] += np.array([1.0, 0.0], np.float32)
        tlj = jnp.asarray(tl)
        trans_a, q_a = traj_local2global_heading(tlj)
        trans_ch, q_ch = traj_local2global_heading_ch(
            [tlj[..., i] for i in range(11)])
        np.testing.assert_allclose(np.asarray(jnp.stack(trans_ch, -1)),
                                   np.asarray(trans_a), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.stack(q_ch, -1)),
                                   np.asarray(q_a), atol=1e-5)

        r6 = rng.normal(0, 1, (64, 6)).astype(np.float32)
        r6[0] = [1, 0, 0, 0, 1, 0]  # identity (degenerate-guard path)
        qa = rot6d_to_quat(jnp.asarray(r6))
        qb = jnp.stack(rot6d_to_quat_ch(
            [jnp.asarray(r6[:, i]) for i in range(6)]), -1)
        np.testing.assert_allclose(np.asarray(qb), np.asarray(qa), atol=1e-6)
        aa_a = quaternion_to_angle_axis(qa)
        aa_b = jnp.stack(quat_to_aa_ch([qb[..., i] for i in range(4)]), -1)
        np.testing.assert_allclose(np.asarray(aa_b), np.asarray(aa_a),
                                   atol=1e-6)
