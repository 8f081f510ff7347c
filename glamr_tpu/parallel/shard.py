"""Multi-axis sharding: FSDP parameter/optimizer sharding + tensor
parallelism over named mesh axes.

The reference's only distribution strategy is DDP (replicated params,
sharded batch — motion_infiller/train.py:114-127); that remains the
default here (`parallel/mesh.py`). This module goes beyond parity for
models/batches that outgrow one chip, the idiomatic-JAX way: annotate
shardings, let XLA's SPMD partitioner insert the collectives.

Axes (any subset; batch always shards over every data axis present):

  dp    data parallel: batch rows split, params replicated along it;
        XLA inserts the gradient all-reduce (rides ICI).
  fsdp  ZeRO-3-style: params AND Adam moments shard their largest
        divisible dim; XLA all-gathers weights per use and
        reduce-scatters gradients. The batch also shards over this axis
        (fsdp is data-parallel for the forward).
  tp    tensor (Megatron-style) parallelism for the transformer CVAE:
        qkv / ffn-in projections column-parallel, out-proj / ffn-out
        row-parallel, derived from flax param paths. LSTM gate kernels
        interleave 4 gates on one dim, so the trajectory predictor uses
        dp+fsdp only.

pp / ep deliberately have no mapping here: the model family tops out at
8 transformer layers / 2 LSTM layers (motion_infiller_demo.yml) — far
too shallow for a pipeline to beat dp+fsdp+tp on ICI — and contains no
mixture-of-experts layers to expert-shard.

Optimizer-state sharding exploits that optax's Adam moments mirror the
flax param dict verbatim: every leaf is matched to its param's
PartitionSpec by its trailing dict-key path, so mu/nu live with the same
layout as their parameter (no resharding inside the Adam update).
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, tree_map_with_path


def make_mesh_nd(axis_sizes: dict[str, int], devices=None) -> Mesh:
    """Mesh over named axes, e.g. {'dp': 2, 'fsdp': 2, 'tp': 2}."""
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes[n] for n in names)
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    assert len(devs) >= n, (len(devs), axis_sizes)
    return Mesh(devs[:n].reshape(shape), names)


# Tensor-parallel rules: (param-path regex, spec builder over ndim).
# Column-parallel layers shard the OUT dim of the kernel and the bias;
# row-parallel layers shard the IN dim of the kernel, bias replicated
# (their output is a partial sum that XLA all-reduces).
_TP_COL = re.compile(r"(self_attn|cross_attn)/(q|k|v)_proj/|linear1/")
_TP_ROW = re.compile(r"(self_attn|cross_attn)/out_proj/|linear2/")


def _tp_dims(path_str: str, ndim: int) -> tuple[Optional[int], ...]:
    """Per-dim tp assignment for a param: index of the dim sharded on tp
    (kernels are (in, out); biases are (out,))."""
    if _TP_COL.search(path_str):
        return (ndim - 1,)  # out dim (kernel) / the bias dim
    if _TP_ROW.search(path_str) and ndim == 2:
        return (0,)  # in dim; row-parallel bias stays replicated
    return ()


def _dict_path(path) -> tuple:
    return tuple(p.key for p in path if isinstance(p, DictKey))


def _path_str(path) -> str:
    return "/".join(str(k) for k in _dict_path(path))


def param_partition_specs(params, mesh: Mesh,
                          fsdp_axis: Optional[str] = "fsdp",
                          tp_axis: Optional[str] = "tp"):
    """PartitionSpec tree for a flax param dict.

    tp dims come from the Megatron rules above; fsdp then takes the
    largest remaining dim divisible by the fsdp axis size. Axes absent
    from the mesh are skipped, so the same function serves dp-only,
    dp+fsdp, and dp+fsdp+tp meshes.
    """
    tp = tp_axis if tp_axis in mesh.axis_names else None
    fsdp = fsdp_axis if fsdp_axis in mesh.axis_names else None
    tp_n = mesh.shape[tp] if tp else 1
    fsdp_n = mesh.shape[fsdp] if fsdp else 1

    def spec(path, x):
        nd = x.ndim
        assign: list[Optional[str]] = [None] * nd
        if nd == 0:
            return P()
        if tp:
            for d in _tp_dims(_path_str(path), nd):
                if x.shape[d] % tp_n == 0:
                    assign[d] = tp
        if fsdp:
            # largest dim not already tp-sharded and divisible by fsdp
            order = sorted(range(nd), key=lambda d: -x.shape[d])
            for d in order:
                if assign[d] is None and x.shape[d] % fsdp_n == 0 \
                        and x.shape[d] >= fsdp_n:
                    assign[d] = fsdp
                    break
        return P(*assign)

    return tree_map_with_path(spec, params)


def state_partition_specs(state, params, mesh: Mesh,
                          fsdp_axis: Optional[str] = "fsdp",
                          tp_axis: Optional[str] = "tp"):
    """PartitionSpec tree for a whole TrainState (params + optax state +
    step), with optimizer moments matched to their parameter's spec by
    trailing dict-key path."""
    pspecs = param_partition_specs(params, mesh, fsdp_axis, tp_axis)
    by_key = {}

    def record(path, s):
        by_key[_dict_path(path)] = s

    tree_map_with_path(record, pspecs,
                       is_leaf=lambda x: isinstance(x, P))

    def spec_for(path, x):
        return by_key.get(_dict_path(path), P())

    return tree_map_with_path(spec_for, state)


def shard_train_state(state, mesh: Mesh,
                      fsdp_axis: Optional[str] = "fsdp",
                      tp_axis: Optional[str] = "tp"):
    """Place a TrainState on the mesh with fsdp+tp parameter sharding.
    Returns (sharded_state, sharding_tree) — pass the tree as the step's
    in/out shardings so state stays resident in its sharded layout."""
    specs = state_partition_specs(state, state.params, mesh,
                                  fsdp_axis, tp_axis)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    placed = jax.tree.map(jax.device_put, state, shardings)
    return placed, shardings


def data_axes(mesh: Mesh, tp_axis: str = "tp") -> tuple[str, ...]:
    """Every mesh axis except tp carries batch rows (dp and fsdp are both
    data-parallel for the forward pass)."""
    return tuple(a for a in mesh.axis_names if a != tp_axis)


def shard_batch_nd(batch, mesh: Mesh, tp_axis: str = "tp"):
    """Shard each leaf's leading axis over all data axes of the mesh."""
    sh = NamedSharding(mesh, P(data_axes(mesh, tp_axis)))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def make_sharded_step(step_core, state, mesh: Mesh,
                      fsdp_axis: Optional[str] = "fsdp",
                      tp_axis: Optional[str] = "tp"):
    """jit a (state, batch, rng) -> (state, metrics) step core with
    fsdp+tp state shardings and the batch split over the data axes.

    Returns (jitted_step, sharded_state). Works with any of the
    trainer's *_step_core factories (infiller, trajpred, detector).
    """
    placed, state_sh = shard_train_state(state, mesh, fsdp_axis, tp_axis)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(data_axes(mesh, tp_axis)))
    step = jax.jit(
        step_core, donate_argnums=0,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
    )
    return step, placed
