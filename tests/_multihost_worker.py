"""Worker process for the 2-process multi-host DP training test.

Launched by tests/test_multihost.py with:
    python tests/_multihost_worker.py <coordinator> <num_procs> <proc_id>

Each process owns 4 virtual CPU devices; the global ('dp',) mesh spans
all 8 across both processes — the same code path `glamr-train
--multihost` uses on a real multi-host slice (jax.distributed +
shard_batch + replicated state), validating SURVEY §2.9's multi-host
claim with REAL process boundaries rather than a single-process mesh.

Prints "MULTIHOST_OK <loss>" on success; the parent asserts both
processes print the same loss (replicated state must agree bit-for-bit
across hosts).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs, len(jax.devices())

    import numpy as np

    from glamr_tpu.models import MotionInfillerConfig, MotionInfillerVAE
    from glamr_tpu.models.configs import TransformerSpec
    from glamr_tpu.parallel import get_mesh, replicate, shard_batch
    from glamr_tpu.train import init_infiller, make_infiller_train_step
    from glamr_tpu.train.trainer import make_tx

    tf = TransformerSpec(nlayer=1, model_dim=32, nhead=2, ff_dim=64,
                         dropout=0.0)
    cfg = MotionInfillerConfig(
        nz=8, past_nframe=2, cur_nframe=4, fut_nframe=2, ctx_in_fc=32,
        ctx_transformer=tf, enc_transformer=tf, dec_transformer=tf,
        prior_transformer=tf, dec_out_mlp=(32,),
    )
    model = MotionInfillerVAE(cfg)
    tx = make_tx(1e-3)
    rng = jax.random.PRNGKey(0)
    mesh = get_mesh()  # global: every device across both processes
    state = replicate(init_infiller(model, tx, rng), mesh)
    step = make_infiller_train_step(
        model, tx, {"mse": {"weight": 1.0, "body_only": True},
                    "vae_z_kld": {"weight": 1e-3, "min_clip": 0.0}}, mesh)

    B, W = 16, cfg.window_len
    r = np.random.default_rng(7)  # SAME seed on every process
    loss = None
    for i in range(3):
        batch = shard_batch({
            "in_body_pose": r.normal(size=(B, W, 69)).astype(np.float32),
            "gt_body_pose": r.normal(size=(B, W, 69)).astype(np.float32),
            "frame_mask": np.ones((B, W), np.float32),
        }, mesh)
        state, metrics = step(state, batch, replicate(rng, mesh))
        loss = float(metrics["loss"])
        assert np.isfinite(loss), loss
    assert int(state.step) == 3

    # fetching replicated state across processes must also work (the
    # checkpoint path does jax.device_get on process 0)
    host_params = jax.device_get(state.params)
    n_leaves = len(jax.tree_util.tree_leaves(host_params))

    print(f"MULTIHOST_OK {loss:.6f} leaves={n_leaves}", flush=True)


if __name__ == "__main__":
    main()
