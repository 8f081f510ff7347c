"""FSDP + tensor-parallel sharding (parallel/shard.py) on the virtual
8-device CPU mesh: layouts are what the rules say, steps run, and a
dp x fsdp x tp step is numerically equivalent to the single-device step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from glamr_tpu.models import MotionInfillerConfig, MotionInfillerVAE, TrajPredConfig, TrajPredVAE
from glamr_tpu.models.configs import TransformerSpec
from glamr_tpu.parallel.shard import (
    data_axes, make_mesh_nd, make_sharded_step, param_partition_specs,
    shard_batch_nd, state_partition_specs,
)
from glamr_tpu.train import init_infiller, init_trajpred
from glamr_tpu.train.trainer import (
    infiller_step_core, make_tx, trajpred_step_core,
)

LOSS_CFG = {"mse": {"weight": 1.0, "body_only": True},
            "vae_z_kld": {"weight": 1e-3, "min_clip": 0.0}}


def tiny_infiller(d=32, heads=2, ff=64):
    tf = TransformerSpec(nlayer=1, model_dim=d, nhead=heads, ff_dim=ff,
                         dropout=0.0)
    cfg = MotionInfillerConfig(
        nz=8, past_nframe=2, cur_nframe=4, fut_nframe=2, ctx_in_fc=d,
        ctx_transformer=tf, enc_transformer=tf, dec_transformer=tf,
        prior_transformer=tf, dec_out_mlp=(d,),
    )
    return MotionInfillerVAE(cfg), cfg


def infiller_batch(B, W, seed=0):
    r = np.random.default_rng(seed)
    return {
        "in_body_pose": r.normal(size=(B, W, 69)).astype(np.float32),
        "gt_body_pose": r.normal(size=(B, W, 69)).astype(np.float32),
        "frame_mask": np.ones((B, W), np.float32),
    }


def test_param_specs_tp_rules():
    model, _ = tiny_infiller()
    mesh = make_mesh_nd({"dp": 2, "fsdp": 2, "tp": 2})
    state = init_infiller(model, make_tx(1e-3), jax.random.PRNGKey(0))
    specs = param_partition_specs(state.params, mesh)
    flat = {"/".join(str(k.key) for k in path): s
            for path, s in jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda x: isinstance(x, P))[0]}
    qkv = [s for p, s in flat.items() if "q_proj/kernel" in p]
    assert qkv and all(s[-1] == "tp" for s in qkv), qkv
    outp = [s for p, s in flat.items() if "out_proj/kernel" in p]
    assert outp and all(s[0] == "tp" for s in outp), outp
    l1 = [s for p, s in flat.items() if "linear1/kernel" in p]
    assert l1 and all(s[-1] == "tp" for s in l1), l1
    l2 = [s for p, s in flat.items() if "linear2/kernel" in p]
    assert l2 and all(s[0] == "tp" for s in l2), l2
    # row-parallel bias replicated on tp, but fsdp may still take it
    l2b = [s for p, s in flat.items() if "linear2/bias" in p]
    assert all("tp" not in s for s in l2b), l2b
    # every 2-D kernel also carries an fsdp dim
    kern = [s for p, s in flat.items() if p.endswith("kernel")]
    assert all(any(a == "fsdp" for a in s) for s in kern), kern


def test_opt_state_specs_match_params():
    model, _ = tiny_infiller()
    mesh = make_mesh_nd({"dp": 2, "fsdp": 2, "tp": 2})
    state = init_infiller(model, make_tx(1e-3), jax.random.PRNGKey(0))
    sspecs = state_partition_specs(state, state.params, mesh)
    pleaves = jax.tree.leaves(
        param_partition_specs(state.params, mesh),
        is_leaf=lambda x: isinstance(x, P))
    flat = jax.tree_util.tree_flatten_with_path(
        sspecs.opt_state, is_leaf=lambda x: isinstance(x, P))[0]
    mu_leaves = [s for path, s in flat
                 if any(isinstance(p, jax.tree_util.GetAttrKey)
                        and p.name == "mu" for p in path)]
    assert pleaves == mu_leaves
    assert sspecs.step == P()


def test_infiller_dp_fsdp_tp_step_equivalence():
    model, cfg = tiny_infiller()
    mesh = make_mesh_nd({"dp": 2, "fsdp": 2, "tp": 2})
    tx = make_tx(1e-3)
    rng = jax.random.PRNGKey(0)
    core = infiller_step_core(model, tx, LOSS_CFG)
    B, W = 8, cfg.window_len
    batch = infiller_batch(B, W)

    # single-device reference
    state0 = init_infiller(model, tx, rng)
    ref_state, ref_metrics = jax.jit(core)(state0, batch, rng)

    step, state = make_sharded_step(core, init_infiller(model, tx, rng),
                                    mesh)
    sbatch = shard_batch_nd(batch, mesh)
    state, metrics = step(state, sbatch, rng)

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-4)
    # params remain sharded after the step and match the reference run
    pl_ref = jax.tree.leaves(ref_state.params)
    pl = jax.tree.leaves(state.params)
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(pl, pl_ref))
    assert err < 5e-4, err
    any_sharded = any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree.leaves(state.params))
    assert any_sharded


def test_infiller_second_step_runs_donated():
    model, cfg = tiny_infiller()
    mesh = make_mesh_nd({"dp": 2, "fsdp": 2, "tp": 2})
    tx = make_tx(1e-3)
    core = infiller_step_core(model, tx, LOSS_CFG)
    step, state = make_sharded_step(
        core, init_infiller(model, tx, jax.random.PRNGKey(1)), mesh)
    batch = shard_batch_nd(infiller_batch(8, cfg.window_len, 1), mesh)
    state, m1 = step(state, batch, jax.random.PRNGKey(2))
    state, m2 = step(state, batch, jax.random.PRNGKey(3))
    assert float(m2["loss"]) < float(m1["loss"]) * 1.5
    assert int(state.step) == 2


def test_trajpred_dp_fsdp():
    cfg = TrajPredConfig(
        nz=8, seq_len=8, ctx_in_mlp=(32,), ctx_rnn_hdim=32,
        ctx_rnn_layers=1, ctx_out_mlp=(32,), enc_in_mlp=(32,),
        enc_rnn_hdim=32, enc_rnn_layers=1, enc_out_mlp=(32,),
        enc_fusion_mlp=(32,), dec_out_mlp=(32,), dec_prior_mlp=(32,),
    )
    model = TrajPredVAE(cfg)
    tx = make_tx(1e-4)
    mesh = make_mesh_nd({"dp": 2, "fsdp": 4})
    assert data_axes(mesh) == ("dp", "fsdp")
    core = trajpred_step_core(
        model, tx, {"trans_mse": {"weight": 1.0},
                    "orient_angle": {"weight": 1.0},
                    "vae_z_kld": {"weight": 1e-3, "min_clip": 0.0}})
    rng = jax.random.PRNGKey(0)
    state0 = init_trajpred(model, tx, rng, seq_len=8)
    r = np.random.default_rng(3)
    B = 8
    batch = {
        "joint_pos": r.normal(size=(B, 8, 69)).astype(np.float32),
        "trans": r.normal(size=(B, 8, 3)).astype(np.float32),
        "orient_q": np.tile(np.array([1, 0, 0, 0], np.float32), (B, 8, 1)),
    }
    ref_state, ref_metrics = jax.jit(core)(state0, batch, rng)

    step, state = make_sharded_step(
        core, init_trajpred(model, tx, rng, seq_len=8), mesh)
    state, metrics = step(state, shard_batch_nd(batch, mesh), rng)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-4)
    any_sharded = any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree.leaves(state.params))
    assert any_sharded


def test_fused_epoch_fsdp():
    """Device-resident fused epoch with FSDP-sharded state: the epoch's
    state shardings follow the input layout, batches shard over both data
    axes, losses stay finite, and state remains sharded afterwards."""
    from glamr_tpu.data import DeviceSampler, synthetic_amass_data
    from glamr_tpu.parallel.shard import shard_train_state
    from glamr_tpu.train.trainer import make_fused_epoch

    model, cfg = tiny_infiller()
    tx = make_tx(1e-3)
    mesh = make_mesh_nd({"dp": 2, "fsdp": 4})
    data, _ = synthetic_amass_data(4, min_len=20, max_len=40)
    dsd = DeviceSampler(data, mesh=mesh)
    core = infiller_step_core(model, tx, LOSS_CFG)
    keys = ("in_body_pose", "gt_body_pose", "frame_mask")
    B, W = 8, cfg.window_len

    def sample(k):
        b = dsd.sample_batch(k, B, W, None)
        return {kk: b[kk] for kk in keys}

    state, _ = shard_train_state(
        init_infiller(model, tx, jax.random.PRNGKey(0)), mesh)
    epoch = make_fused_epoch(core, sample, 3, mesh=mesh,
                             axis=("dp", "fsdp"))
    state, metrics = epoch(state, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert int(state.step) == 3
    assert any(not leaf.sharding.is_fully_replicated
               for leaf in jax.tree.leaves(state.params))


def test_mesh_nd_shapes():
    mesh = make_mesh_nd({"dp": 4, "tp": 2})
    assert mesh.axis_names == ("dp", "tp")
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}
    assert data_axes(mesh) == ("dp",)
