"""SMPL body model tests: self-consistency, FK correctness, LBS sanity."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from glamr_tpu.body import (
    SMPL,
    SMPL_PARENTS,
    get_smpl,
    lbs,
    rigid_fk,
    smpl_to_body26fk_map,
    synthetic_smpl_model,
)


@pytest.fixture(scope="module")
def smpl():
    return get_smpl("body26fk", synthetic=True)


class TestModel:
    def test_synthetic_self_consistent(self, smpl):
        m = smpl.model
        reg = np.asarray(jnp.einsum("jv,vc->jc", m.j_regressor, m.v_template))
        # regressed template joints must match the FK rest skeleton
        rest = np.asarray(m.v_template)
        assert reg.shape == (24, 3)
        # lbs weights: rows sum to one
        np.testing.assert_allclose(np.asarray(m.lbs_weights).sum(1), 1.0, atol=1e-5)

    def test_deterministic(self):
        a = synthetic_smpl_model(512, seed=3)
        b = synthetic_smpl_model(512, seed=3)
        np.testing.assert_array_equal(np.asarray(a.v_template), np.asarray(b.v_template))


class TestFK:
    def test_zero_pose_is_rest(self, smpl):
        B = 2
        joints = smpl.get_joints(jnp.zeros((B, 3)), jnp.zeros((B, 69)))
        m = smpl.model
        rest = np.asarray(jnp.einsum("jv,vc->jc", m.j_regressor, m.v_template))
        np.testing.assert_allclose(np.asarray(joints)[0], rest, atol=1e-5)

    def test_global_rotation_rotates_all(self, smpl):
        aa = np.array([[0.3, -0.2, 0.5]], np.float32)
        joints = np.asarray(smpl.get_joints(jnp.array(aa), jnp.zeros((1, 69))))
        rest = np.asarray(smpl.get_joints(jnp.zeros((1, 3)), jnp.zeros((1, 69))))[0]
        root = rest[0]
        want = (rest - root) @ R.from_rotvec(aa[0]).as_matrix().T + root
        np.testing.assert_allclose(joints[0], want, atol=1e-4)

    def test_child_joint_rotation(self, smpl):
        """Rotating the left knee moves the left ankle but not the arms."""
        pose = np.zeros((1, 69), np.float32)
        # body_pose index for joint j (1..23) is (j-1)*3; left_knee = joint 4
        pose[0, 3 * 3: 3 * 3 + 3] = [1.0, 0, 0]
        joints = np.asarray(smpl.get_joints(jnp.zeros((1, 3)), jnp.array(pose)))[0]
        rest = np.asarray(smpl.get_joints(jnp.zeros((1, 3)), jnp.zeros((1, 69))))[0]
        # ankle (7) moved, wrist (20) unchanged
        assert np.linalg.norm(joints[7] - rest[7]) > 0.05
        np.testing.assert_allclose(joints[20], rest[20], atol=1e-5)

    def test_bone_lengths_preserved(self, smpl, rng):
        pose = (rng.normal(size=(3, 69)) * 0.3).astype(np.float32)
        go = (rng.normal(size=(3, 3)) * 0.5).astype(np.float32)
        joints = np.asarray(smpl.get_joints(jnp.array(go), jnp.array(pose)))
        rest = np.asarray(smpl.get_joints(jnp.zeros((1, 3)), jnp.zeros((1, 69))))[0]
        for j in range(1, 24):
            p = SMPL_PARENTS[j]
            want = np.linalg.norm(rest[j] - rest[p])
            got = np.linalg.norm(joints[:, j] - joints[:, p], axis=-1)
            np.testing.assert_allclose(got, want, atol=1e-4)


class TestLBS:
    def test_zero_pose_verts_near_template(self, smpl):
        out = smpl.forward(jnp.zeros((1, 3)), jnp.zeros((1, 69)), jnp.zeros((1, 10)))
        np.testing.assert_allclose(
            np.asarray(out.vertices)[0], np.asarray(smpl.model.v_template), atol=1e-4
        )

    def test_betas_change_shape(self, smpl):
        out0 = smpl.forward(jnp.zeros((1, 3)), jnp.zeros((1, 69)), jnp.zeros((1, 10)))
        out1 = smpl.forward(jnp.zeros((1, 3)), jnp.zeros((1, 69)), jnp.ones((1, 10)))
        assert np.abs(np.asarray(out1.vertices) - np.asarray(out0.vertices)).max() > 1e-3

    def test_root_trans_anchors_root(self, smpl, rng):
        rt = rng.normal(size=(2, 3)).astype(np.float32)
        pose = (rng.normal(size=(2, 69)) * 0.2).astype(np.float32)
        out = smpl.forward(
            jnp.zeros((2, 3)), jnp.array(pose), jnp.zeros((2, 10)),
            root_trans=jnp.array(rt),
        )
        # joint 0 of the pose-type ordering is Pelvis (MPII) — close to root;
        # verify re-anchoring via the invariant that shifting root_trans
        # translates everything rigidly
        out2 = smpl.forward(
            jnp.zeros((2, 3)), jnp.array(pose), jnp.zeros((2, 10)),
            root_trans=jnp.array(rt + 1.0),
        )
        np.testing.assert_allclose(
            np.asarray(out2.vertices), np.asarray(out.vertices) + 1.0, atol=1e-4
        )

    def test_pose2rot_false_matches(self, smpl, rng):
        aa = (rng.normal(size=(2, 24, 3)) * 0.3).astype(np.float32)
        rm = R.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(2, 24, 3, 3).astype(np.float32)
        j_aa = smpl.get_joints(jnp.array(aa[:, 0]), jnp.array(aa[:, 1:].reshape(2, 69)))
        j_rm = rigid_fk(
            smpl.model, jnp.array(rm[:, 0].reshape(2, 9)),
            jnp.array(rm[:, 1:].reshape(2, -1)), pose2rot=False,
        )
        np.testing.assert_allclose(np.asarray(j_aa), np.asarray(j_rm), atol=1e-4)

    def test_pose_type_joint_count(self, smpl):
        out = smpl.forward(jnp.zeros((1, 3)), jnp.zeros((1, 69)), jnp.zeros((1, 10)))
        assert out.joints.shape == (1, 26, 3)

    def test_joint_pos_from_body_pose_shape(self, smpl, rng):
        bp = (rng.normal(size=(2, 5, 69)) * 0.2).astype(np.float32)
        jp = smpl.joint_pos_from_body_pose(jnp.array(bp))
        assert jp.shape == (2, 5, 69)


class TestMaps:
    def test_smpl_to_body26fk(self):
        m = smpl_to_body26fk_map()
        # 14 joints share names between the two sets
        assert m.shape == (14, 2)
        assert m[:, 0].max() < 26 and m[:, 1].max() < 24
        # pelvis maps to pelvis
        assert [0, 0] in m.tolist()


class TestJointsFast:
    def test_matches_full_forward(self, smpl, rng):
        B = 5
        orient = jnp.asarray(rng.normal(0, 0.4, (B, 3)).astype(np.float32))
        pose = jnp.asarray(rng.normal(0, 0.3, (B, 69)).astype(np.float32))
        betas = jnp.asarray(rng.normal(0, 1.0, (B, 10)).astype(np.float32))
        trans = jnp.asarray(rng.normal(0, 1.0, (B, 3)).astype(np.float32))
        full = smpl.forward(orient, pose, betas, root_trans=trans)
        fast = smpl.joints_fast(orient, pose, betas, root_trans=trans)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(full.joints), atol=2e-5)

    def test_subset_is_small(self, smpl):
        assert smpl._sub_v_template.shape[0] < smpl.model.num_verts


class TestPallasLBS:
    def test_fallback_matches_einsum(self, smpl, rng):
        """Off-TPU the fused-LBS entry point must route to the einsum path
        and match it exactly (on-TPU correctness is asserted in the kernel
        module docstring benchmark: 2.4e-7 max err at V=6912)."""
        from glamr_tpu.body.pallas_lbs import lbs_verts
        from glamr_tpu.body.lbs import lbs as lbs_einsum

        B = 3
        betas = jnp.asarray(rng.normal(0, 0.5, (B, 10)).astype(np.float32))
        pose = jnp.asarray(rng.normal(0, 0.3, (B, 72)).astype(np.float32))
        v1, j1 = lbs_verts(smpl.model, betas, pose)
        v2, j2 = lbs_einsum(smpl.model, betas, pose)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


class TestSoA:
    def test_soa_matches_aos(self, smpl, rng):
        """Channel-leading joints_fast (lbs_soa) == array-of-structs
        reference implementation, including root re-anchoring, scale, the
        zero-pose Taylor guard, and gradient finiteness at theta=0.
        (Called directly — the joints_fast entry point only routes to SoA
        at production batch sizes, where the compile cost pays off.)"""
        from glamr_tpu.body.lbs_soa import joints_fast_soa

        B = 11
        orient = jnp.asarray(rng.normal(0, 1.0, (B, 3)).astype(np.float32))
        pose = jnp.asarray(rng.normal(0, 0.4, (B, 69)).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 1.0, (B, 10)).astype(np.float32))
        rt = jnp.asarray(rng.normal(0, 1.0, (B, 3)).astype(np.float32))
        rs = jnp.asarray(rng.uniform(0.8, 1.2, (B,)).astype(np.float32))
        for kwargs in ({}, {"root_trans": rt},
                       {"root_trans": rt, "root_scale": rs}):
            a = smpl.joints_fast_aos(orient, pose, beta, **kwargs)
            b = joints_fast_soa(smpl, orient, pose, beta, **kwargs)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-6)
        # zero pose: Taylor-guard path, exact agreement + finite grads
        z = jnp.zeros((4, 69))
        zo, zb = jnp.zeros((4, 3)), jnp.zeros((4, 10))
        np.testing.assert_allclose(
            np.asarray(smpl.joints_fast_aos(zo, z, zb)),
            np.asarray(joints_fast_soa(smpl, zo, z, zb)), atol=1e-7)
        g = jax.grad(
            lambda p: jnp.sum(joints_fast_soa(smpl, zo, p, zb) ** 2))(z)
        assert bool(jnp.isfinite(g).all())

    def test_rigid_fk_soa_matches(self, smpl, rng):
        """Template-FK SoA path (get_joints at production batch sizes) ==
        AoS rigid_fk."""
        from glamr_tpu.body.lbs import rigid_fk
        from glamr_tpu.body.lbs_soa import rigid_fk_soa

        B = 16
        o = jnp.asarray(rng.normal(0, 1, (B, 3)).astype(np.float32))
        p = jnp.asarray(rng.normal(0, 0.4, (B, 69)).astype(np.float32))
        t = jnp.asarray(rng.normal(0, 1, (B, 3)).astype(np.float32))
        a = rigid_fk(smpl.model, o, p, t)
        b = rigid_fk_soa(smpl.model, o, p, t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


class TestRealAssetLoadPath:
    """The real-SMPL-file load path + the evaluator's H36M J_regressor
    route, driven with FABRICATED reference-layout assets (no licensed
    files in this image). The moment real SMPL pkls + J_regressor npys
    land in data/, this exact code path runs (reference consumes them at
    lib/models/smpl.py:23-25; evaluator joint protocol
    global_recon/utils/evaluator.py:266-270)."""

    def test_load_smpl_pkl_and_jregressors(self, tmp_path, monkeypatch):
        import pickle

        from glamr_tpu.body import model as bm

        syn = synthetic_smpl_model(num_verts=420)
        V = 420
        raw = {
            "v_template": np.asarray(syn.v_template),
            "shapedirs": np.asarray(syn.shapedirs),
            # reference pkl stores posedirs flattened (V*3, 207)
            "posedirs": np.asarray(syn.posedirs).reshape(V * 3, -1),
            "J_regressor": np.asarray(syn.j_regressor),
            "weights": np.asarray(syn.lbs_weights),
            # row 0 = parents with the real files' 2^32-1 root sentinel
            "kintree_table": np.stack([
                np.asarray(syn.parents).astype(np.int64) % 2**32,
                np.arange(24, dtype=np.int64)]),
            "f": np.asarray(syn.faces),
        }
        mdir = tmp_path / "smpl"
        mdir.mkdir()
        with open(mdir / "SMPL_NEUTRAL.pkl", "wb") as f:
            pickle.dump(raw, f)
        rng = np.random.default_rng(0)
        jrh = np.abs(rng.standard_normal((17, V))).astype(np.float32)
        jrh /= jrh.sum(1, keepdims=True)
        jre = np.abs(rng.standard_normal((9, V))).astype(np.float32)
        jre /= jre.sum(1, keepdims=True)
        np.save(tmp_path / "jrh.npy", jrh)
        np.save(tmp_path / "jre.npy", jre)
        monkeypatch.setattr(bm, "JOINT_REGRESSOR_H36M",
                            str(tmp_path / "jrh.npy"))
        monkeypatch.setattr(bm, "JOINT_REGRESSOR_EXTRA",
                            str(tmp_path / "jre.npy"))

        m = bm.load_smpl(str(mdir))
        assert int(m.num_verts) == V
        assert int(m.parents[0]) == -1
        np.testing.assert_allclose(np.asarray(m.j_regressor_h36m), jrh,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(m.j_regressor_extra), jre,
                                   rtol=1e-6)
        # skinning result identical to the source synthetic model: the
        # pkl round-trip (flattened posedirs, uint32 kintree) is lossless
        beta = jnp.asarray(np.random.default_rng(1)
                           .normal(0, 0.5, (2, 10)).astype(np.float32))
        pose = jnp.asarray(np.random.default_rng(2)
                           .normal(0, 0.3, (2, 72)).astype(np.float32))
        v1, j1 = lbs(m, beta, pose)
        v2, j2 = lbs(syn, beta, pose)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-6)

        # evaluator consumes the H36M regressor from this model
        from glamr_tpu.eval import Evaluator

        ev = Evaluator(algo="it", dataset="3DPW", smpl=SMPL(model=m))
        np.testing.assert_allclose(np.asarray(ev.J_regressor), jrh,
                                   rtol=1e-6)
        jh = jnp.einsum("jv,tvc->tjc", m.j_regressor_h36m, v1)
        assert jh.shape == (2, 17, 3) and bool(jnp.isfinite(jh).all())
