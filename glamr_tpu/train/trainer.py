"""CVAE training steps: optax Adam + grad-clip, jitted with DP shardings.

The TPU-native replacement for the Lightning DDP harness
(motion_infiller/train.py:114-127, traj_pred/train.py): one jitted
train_step per model; parameters replicated, batch sharded over the 'dp'
mesh axis; XLA inserts the gradient all-reduce from the shardings.
Gradient clip 5.0 and Adam lr match the reference configs
(motion_infiller_demo.yml lr 1e-3, traj_pred_demo.yml lr 1e-4).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.loss_func import infiller_loss_dict, traj_pred_loss_dict, weighted_total
from ..models.motion_infiller import MotionInfillerVAE
from ..models.traj_pred import TrajPredVAE


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def make_tx(lr: float, clip: float = 5.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
    )


def _cast_floats(tree, dtype):
    """Cast floating-point leaves to dtype; everything else untouched."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def mixed_precision(apply_fn, compute_dtype):
    """Mixed-precision policy around a flax apply: params and float inputs
    are cast to compute_dtype (bf16 matmuls on the MXU), outputs cast back
    to f32 so losses/KL accumulate in f32. Master params and Adam state
    stay f32 (grads flow through the casts and land in f32). TPU-native
    analog of the reference's pl.Trainer precision flag
    (motion_infiller/train.py:28,123).
    """
    if compute_dtype is None:
        return apply_fn

    def wrapped(params, *inputs, **kwargs):
        out = apply_fn(_cast_floats(params, compute_dtype),
                       *_cast_floats(inputs, compute_dtype), **kwargs)
        return _cast_floats(out, jnp.float32)

    return wrapped


def maybe_remat(loss_fn, enabled: bool):
    """Full-graph gradient rematerialization (jax.checkpoint): store no
    forward activations and recompute them during the backward pass —
    ~2x forward FLOPs for a near-flat activation-memory profile, the
    standard HBM-for-FLOPs trade that unlocks larger per-chip batches on
    TPU. Grad values are identical (tests/test_train.py pins this);
    enable via `glamr-train --remat`."""
    return jax.checkpoint(loss_fn) if enabled else loss_fn


# ------------------------------------------------------------------ infiller

def init_infiller(model: MotionInfillerVAE, tx, rng, batch_size=2):
    c = model.cfg
    pose = jnp.zeros((batch_size, c.window_len, 69))
    mask = jnp.ones((batch_size, c.window_len))
    params = model.init(rng, pose, pose, mask)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_infiller_train_step(model: MotionInfillerVAE, tx, loss_cfg: dict,
                             mesh: Optional[Mesh] = None,
                             compute_dtype=None, remat=False):
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: in_body_pose/gt_body_pose (B, W, 69), frame_mask (B, W).
    compute_dtype=jnp.bfloat16 enables mixed-precision compute;
    remat=True enables gradient rematerialization (see maybe_remat).
    """
    step = infiller_step_core(model, tx, loss_cfg,
                              compute_dtype=compute_dtype, remat=remat)

    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step, donate_argnums=0,
        in_shardings=(repl, dp, repl), out_shardings=(repl, repl),
    )


def make_infiller_eval_step(model: MotionInfillerVAE, loss_cfg: dict,
                            mesh: Optional[Mesh] = None,
                            compute_dtype=None):
    """Loss-only step (no update, no buffer donation) for validation."""
    apply_fn = mixed_precision(model.apply, compute_dtype)

    def step(params, batch, rng):
        out = apply_fn(
            params, batch["in_body_pose"], batch["gt_body_pose"],
            batch["frame_mask"], rng=None,
        )
        data = {**batch, **out}
        total, uw = weighted_total(data, loss_cfg, infiller_loss_dict)
        return {"loss": total, **uw}

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(step, in_shardings=(repl, dp, repl), out_shardings=repl)


# ----------------------------------------------------------------- traj pred

def init_trajpred(model: TrajPredVAE, tx, rng, batch_size=2, seq_len=16):
    jp = jnp.zeros((batch_size, seq_len, 69))
    trans = jnp.zeros((batch_size, seq_len, 3))
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (batch_size, seq_len, 1))
    params = model.init(rng, jp, trans, q)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def trajpred_step_core(model: TrajPredVAE, tx, loss_cfg: dict,
                       compute_dtype=None, remat=False):
    """Unjitted traj-pred train step (state, batch, rng) -> (state, metrics)
    for composition into fused epochs / sharded steps.
    batch: joint_pos (B,T,69), trans (B,T,3), orient_q (B,T,4),
    optional frame_loss_mask (B,T)."""
    apply_fn = mixed_precision(model.apply, compute_dtype)

    def loss_fn(params, batch, rng):
        sample_rng, drop_rng = jax.random.split(rng)
        out = apply_fn(
            params, batch["joint_pos"], batch["trans"], batch["orient_q"],
            rng=sample_rng, rngs={"dropout": drop_rng},
        )
        data = {**batch, **out}
        total, uw = weighted_total(data, loss_cfg, traj_pred_loss_dict)
        return total, uw

    loss_fn = maybe_remat(loss_fn, remat)

    def step(state: TrainState, batch, rng):
        (loss, uw), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, **uw}

    return step


def make_trajpred_train_step(model: TrajPredVAE, tx, loss_cfg: dict,
                             mesh: Optional[Mesh] = None,
                             compute_dtype=None, remat=False):
    """Jitted single traj-pred train step (see trajpred_step_core)."""
    step = trajpred_step_core(model, tx, loss_cfg, compute_dtype,
                              remat=remat)
    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step, donate_argnums=0,
        in_shardings=(repl, dp, repl), out_shardings=(repl, repl),
    )


def make_trajpred_eval_step(model: TrajPredVAE, loss_cfg: dict,
                            mesh: Optional[Mesh] = None,
                            compute_dtype=None):
    """Loss-only step (no update, no buffer donation) for validation."""
    apply_fn = mixed_precision(model.apply, compute_dtype)

    def step(params, batch, rng):
        out = apply_fn(
            params, batch["joint_pos"], batch["trans"], batch["orient_q"],
            rng=None,
        )
        data = {**batch, **out}
        total, uw = weighted_total(data, loss_cfg, traj_pred_loss_dict)
        return {"loss": total, **uw}

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(step, in_shardings=(repl, dp, repl), out_shardings=repl)


def make_multistep(step_fn_core, K: int):
    """Wrap a (state, batch, rng) -> (state, metrics) step into a
    K-step lax.scan over stacked batches (K, B, ...): ONE device dispatch
    executes K optimizer steps. On deployments where each dispatch costs
    a host round-trip (e.g. a tunneled TPU), this amortizes dispatch to
    ~1/K (measured: 877 ms/step dispatched singly vs 99 ms on-device).

    step_fn_core must be the UNjitted step (build with mesh=None and take
    the returned function's underlying python callable via .__wrapped__,
    or pass the closure before jit). Simplest: use the factories below.
    """

    def multi(state, batches, rng):
        def body(carry, xs):
            st, r = carry
            batch = xs
            r, sub = jax.random.split(r)
            st, metrics = step_fn_core(st, batch, sub)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), batches)
        return state, jax.tree.map(lambda x: x[-1], metrics)

    return jax.jit(multi, donate_argnums=0)


def make_fused_epoch(step_core, sample_fn, K: int, mesh=None, axis="dp",
                     data=None):
    """Fuse K x (on-device batch draw -> train step) into ONE jitted
    lax.scan — a single dispatch per K steps. With per-step dispatch the
    wall-clock is dominated by host round-trips (measured on a tunneled
    v5e: ~91 ms/step dispatched singly vs ~3 ms/step of actual device
    compute at batch 1024); fused, an epoch runs at device speed.

    step_core: UNjitted (state, batch, rng) -> (state, metrics).
    sample_fn: (key) -> batch dict (jit-composable, e.g. a DeviceSampler
    closure). Returns epoch(state, rng) -> (state, stacked metrics).

    With a mesh, the drawn batch is constrained to shard on its leading
    axis over `axis`: the SPMD partitioner then splits the sampler's
    window gather so each device gathers only its own rows from the
    (replicated) dataset, the loss reduction becomes a cross-device psum,
    and the gradient all-reduce rides ICI — still one dispatch per epoch,
    no per-device Python (the jit analog of the reference's DDP epoch,
    motion_infiller/train.py:117-119).

    axis may be a tuple for multi-axis data sharding (e.g. ('dp','fsdp')
    with a state sharded by parallel/shard.py: pass that state in and the
    epoch runs FSDP — state shardings follow the input layout).

    data: optional device-resident pytree threaded through the jit as an
    EXPLICIT argument; sample_fn is then called as sample_fn(data, key).
    A sampler that merely closes over large device arrays bakes them into
    the traced program as HLO literals — a ~200 MB detector pool then
    inflates the serialized compile payload past what a remote-compile
    relay accepts (observed: HTTP 413 on the tunneled v5e). As a jit
    parameter the pool stays a runtime input: zero transfer (it already
    lives in HBM) and a compile request that is just the program.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        bsh = NamedSharding(mesh, P(axis))

    def epoch(state, rng, data):
        def body(carry, _):
            st, r = carry
            r, kb, ks = jax.random.split(r, 3)
            batch = sample_fn(data, kb) if data is not None else sample_fn(kb)
            if mesh is not None:
                batch = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, bsh), batch)
            st, metrics = step_core(st, batch, ks)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), None, length=K)
        return state, metrics

    jitted = jax.jit(epoch, donate_argnums=0, static_argnames=())
    if data is None:
        return lambda state, rng: jitted(state, rng, None)
    return lambda state, rng: jitted(state, rng, data)


def infiller_step_core(model: MotionInfillerVAE, tx, loss_cfg: dict,
                       compute_dtype=None, remat=False):
    """Unjitted infiller train step (state, batch, rng) -> (state, metrics)
    for composition into fused epochs/multisteps."""
    apply_fn = mixed_precision(model.apply, compute_dtype)

    def loss_fn(params, batch, rng):
        sample_rng, drop_rng = jax.random.split(rng)
        out = apply_fn(
            params, batch["in_body_pose"], batch["gt_body_pose"],
            batch["frame_mask"], rng=sample_rng, deterministic=False,
            rngs={"dropout": drop_rng},
        )
        data = {**batch, **out, "out_body_pose": out["out_body_pose"]}
        total, uw = weighted_total(data, loss_cfg, infiller_loss_dict)
        return total, uw

    loss_fn = maybe_remat(loss_fn, remat)

    def step(state, batch, rng):
        (loss, uw), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), {"loss": loss, **uw}

    return step


def trajpred_device_step_core(model: TrajPredVAE, tx, loss_cfg: dict, smpl,
                              compute_dtype=None, remat=False):
    """Unjitted traj-pred step over RAW device-sampler batches (FK + quat
    conversion inside), for composition into fused epochs."""
    from ..transforms import angle_axis_to_quaternion
    apply_fn = mixed_precision(model.apply, compute_dtype)

    def loss_fn(params, batch, rng):
        sample_rng, drop_rng = jax.random.split(rng)
        joint_pos = smpl.joint_pos_from_body_pose(batch["pose"][..., 3:])
        orient_q = angle_axis_to_quaternion(batch["pose"][..., :3])
        out = apply_fn(
            params, joint_pos, batch["trans"], orient_q,
            rng=sample_rng, rngs={"dropout": drop_rng},
        )
        data = {**batch, **out, "orient_q": orient_q,
                "frame_loss_mask": batch["frame_loss_mask"][..., 0]}
        total, uw = weighted_total(data, loss_cfg, traj_pred_loss_dict)
        return total, uw

    loss_fn = maybe_remat(loss_fn, remat)

    def step(state, batch, rng):
        (loss, uw), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), {"loss": loss, **uw}

    return step


def make_infiller_multistep(model: MotionInfillerVAE, tx, loss_cfg: dict,
                            K: int, compute_dtype=None):
    """K-step fused infiller trainer: (state, batches (K,B,...), rng)."""
    return make_multistep(
        infiller_step_core(model, tx, loss_cfg, compute_dtype=compute_dtype), K)


# -------------------------------------------------------------- kp lifter

def make_lifter_train_step(model, tx, loss_cfg: dict,
                           mesh: Optional[Mesh] = None,
                           compute_dtype=None, remat=False):
    """Train step for the keypoint lifter (pose_est/lifter.py).
    batch: kp_2d (B,T,K,2), vis (B,T,K), gt_* targets (see LifterDataGen)."""
    from ..pose_est.lifter import lifter_loss_dict
    apply_fn = mixed_precision(model.apply, compute_dtype)

    def loss_fn(params, batch, rng):
        out = apply_fn(params, batch["kp_2d"], batch["vis"],
                          deterministic=False, rngs={"dropout": rng})
        total, uw = weighted_total({**batch, **out}, loss_cfg,
                                   lifter_loss_dict)
        return total, uw

    loss_fn = maybe_remat(loss_fn, remat)

    def step(state: TrainState, batch, rng):
        (loss, uw), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), {"loss": loss, **uw}

    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(step, donate_argnums=0,
                   in_shardings=(repl, dp, repl), out_shardings=(repl, repl))


def make_lifter_eval_step(model, loss_cfg: dict,
                          mesh: Optional[Mesh] = None,
                          compute_dtype=None):
    from ..pose_est.lifter import lifter_loss_dict
    apply_fn = mixed_precision(model.apply, compute_dtype)

    def step(params, batch, rng):
        out = apply_fn(params, batch["kp_2d"], batch["vis"])
        total, uw = weighted_total({**batch, **out}, loss_cfg,
                                   lifter_loss_dict)
        return {"loss": total, **uw}

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(step, in_shardings=(repl, dp, repl), out_shardings=repl)


def detector_step_core(model, tx, loss_cfg: dict, compute_dtype=None,
                       remat=False):
    """Unjitted detector train step (state, batch, rng) -> (state, metrics)
    for composition into fused epochs. batch: images (B,H,W,3) + gt_*
    CenterNet targets (DetectorDataGen)."""
    from ..pose_est.detector import detector_loss_dict
    apply_fn = mixed_precision(model.apply, compute_dtype)

    def loss_fn(params, batch, rng):
        out = apply_fn(params, batch["images"], deterministic=False)
        total, uw = weighted_total({**batch, **out}, loss_cfg,
                                   detector_loss_dict)
        return total, uw

    loss_fn = maybe_remat(loss_fn, remat)

    def step(state: TrainState, batch, rng):
        (loss, uw), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), {"loss": loss, **uw}

    return step


def make_detector_train_step(model, tx, loss_cfg: dict,
                             mesh: Optional[Mesh] = None,
                             compute_dtype=None, remat=False):
    """Jitted single detector train step (see detector_step_core)."""
    step = detector_step_core(model, tx, loss_cfg, compute_dtype,
                              remat=remat)
    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(step, donate_argnums=0,
                   in_shardings=(repl, dp, repl), out_shardings=(repl, repl))


def make_detector_pool_sampler(pool: dict, batch_size: int,
                               mesh: Optional[Mesh] = None):
    """On-device batch draws from a pre-rendered detector pool
    (pose_est/synth_images.py build_detector_pool): gather a random
    subset, dequantize the uint8 images/heatmaps, and re-diversify with
    photometric augmentation (brightness/offset jitter + pixel noise) —
    all inside the fused-epoch scan, zero per-step host traffic.

    Returns (sample_fn, dev_pool, num_images); sample_fn has signature
    (dev_pool, key) -> batch and must receive the pool as an explicit
    argument (pass dev_pool as make_fused_epoch's `data`): the pool is
    far too large to ride the compile payload as a closure constant.
    """
    # store each entry ROW-FLATTENED: a gather over [N, prod(shape)] rows
    # tiles the lane dim cleanly (e.g. 32*32*24 = 192*128), while the
    # logical [N, 32, 32, 24] layout lane-pads 24 -> 128 (5.3x) and the
    # gather fusion's row staging then exceeds the TPU's 16 MB scoped-vmem
    # limit (observed: 18 MB alloc, libtpu AOT compile failure). The
    # reshape back to logical shape happens on the gathered batch.
    arrs = {k: np.asarray(v) for k, v in pool.items()}  # one host copy per key
    shapes = {k: a.shape[1:] for k, a in arrs.items()}
    flat = {k: a.reshape(len(a), -1) for k, a in arrs.items()}
    if mesh is not None:
        # replicate the pool over the mesh so each device's shard of the
        # batch gathers locally (same layout as data/device_sampler.py)
        repl = NamedSharding(mesh, P())
        dev = {k: jax.device_put(jnp.asarray(v), repl)
               for k, v in flat.items()}
    else:
        dev = {k: jnp.asarray(v) for k, v in flat.items()}
    n = int(dev["images"].shape[0])

    def sample(dev_pool, key):
        ki, kb, ko, kn, kc, kg = jax.random.split(key, 6)
        idx = jax.random.randint(ki, (batch_size,), 0, n)
        b = {k: v[idx].reshape((batch_size,) + shapes[k])
             for k, v in dev_pool.items()}
        img = b["images"].astype(jnp.float32) / 255.0
        bright = jax.random.uniform(kb, (batch_size, 1, 1, 1),
                                    minval=0.75, maxval=1.25)
        off = jax.random.uniform(ko, (batch_size, 1, 1, 1),
                                 minval=-0.08, maxval=0.08)
        # per-channel gain (white balance) + contrast about the mean
        chan = jax.random.uniform(kc, (batch_size, 1, 1, 3),
                                  minval=0.85, maxval=1.15)
        contrast = jax.random.uniform(kg, (batch_size, 1, 1, 1),
                                      minval=0.8, maxval=1.2)
        # augment the CONTENT region only: letterbox padding is exactly
        # zero at inference (estimator.py detect_video zero-fills), so
        # brightness/offset/noise must not leak into it, and the contrast
        # mean must not be diluted by padding rows. Padding pixels are
        # exactly (0,0,0) uint8 by construction (letterbox_content).
        content = (b["images"].sum(axis=-1, keepdims=True) > 0
                   ).astype(jnp.float32)
        npix = jnp.maximum(content.sum(axis=(1, 2, 3), keepdims=True), 1.0)
        mean = (img * content).sum(axis=(1, 2, 3), keepdims=True) \
            / (npix * img.shape[-1])
        aug = (img - mean) * contrast + mean
        aug = jnp.clip(aug * bright * chan + off, 0.0, 1.0)
        aug = aug + 0.02 * jax.random.normal(kn, aug.shape)
        b["images"] = aug * content
        b["gt_center_hm"] = b["gt_center_hm"].astype(jnp.float32) / 255.0
        b["gt_kp_hm"] = b["gt_kp_hm"].astype(jnp.float32) / 255.0
        return b

    return sample, dev, n


def make_detector_eval_step(model, loss_cfg: dict,
                            mesh: Optional[Mesh] = None,
                            compute_dtype=None):
    from ..pose_est.detector import detector_loss_dict
    apply_fn = mixed_precision(model.apply, compute_dtype)

    def step(params, batch, rng):
        out = apply_fn(params, batch["images"])
        total, uw = weighted_total({**batch, **out}, loss_cfg,
                                   detector_loss_dict)
        return {"loss": total, **uw}

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(step, in_shardings=(repl, dp, repl), out_shardings=repl)


def make_trajpred_device_step(model: TrajPredVAE, tx, loss_cfg: dict, smpl,
                              compute_dtype=None, remat=False):
    """Train step whose batch is the RAW device-sampler output (pose (B,T,72),
    trans (B,T,3), frame_loss_mask): joint positions (template FK) and the
    orientation quaternion are derived on-device inside the step, so the
    whole trajectory-predictor data path needs no host work."""
    return jax.jit(
        trajpred_device_step_core(model, tx, loss_cfg, smpl,
                                  compute_dtype=compute_dtype, remat=remat),
        donate_argnums=0)
