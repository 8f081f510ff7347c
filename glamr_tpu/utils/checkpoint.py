"""Checkpoint I/O: orbax for native params, plus a PyTorch-Lightning
.ckpt reader for porting reference weights (SURVEY.md §5.4 — the parity
path: reference training checkpoints -> flax pytrees).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, step: Optional[int] = None):
    """Save a pytree checkpoint (orbax if available, pickle fallback)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
    except Exception:
        with open(path if path.endswith(".pkl") else path + ".pkl", "wb") as f:
            pickle.dump(jax.device_get(state), f)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a checkpoint. Pass `target` (a pytree of the expected
    structure) to get typed containers back — orbax otherwise returns
    plain nested dicts."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        if target is not None:
            return ckptr.restore(path, target)
        return ckptr.restore(path)
    pkl = path if path.endswith(".pkl") else path + ".pkl"
    with open(pkl, "rb") as f:
        return pickle.load(f)


def load_torch_state_dict(ckpt_path: str) -> dict:
    """Read a PyTorch-Lightning .ckpt and return {name: np.ndarray}.

    Uses torch (CPU build is in the image) only for deserialization —
    nothing torch crosses this boundary (reference checkpoints are
    Lightning dicts with a 'state_dict' key; motion_traj_joint_model.py
    :44,65 loads them with strict=False).
    """
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def port_linear(sd: dict, prefix: str) -> dict:
    """torch nn.Linear -> flax Dense params {'kernel','bias'}."""
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def port_layernorm(sd: dict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def extract_params(obj: Any) -> Any:
    """Model params from whatever a checkpoint holds: a full TrainState
    (pickled flax struct), an orbax nested dict, or a params-only release
    artifact ({'format': 'glamr_tpu.params.v1', 'params': ...}). Release
    artifacts store float16 (half-size committed files) and are cast back
    to float32 here."""
    if isinstance(obj, dict) and "params" in obj:
        params = obj["params"]
        if str(obj.get("format", "")).startswith("glamr_tpu.params"):
            def f32(tree):
                if isinstance(tree, dict):
                    return {k: f32(v) for k, v in tree.items()}
                a = np.asarray(tree)
                return a.astype(np.float32) if a.dtype.kind == "f" else a
            params = f32(params)
        return params
    if hasattr(obj, "params"):
        return obj.params
    return obj


def released_checkpoint_path(cfg_id: str) -> Optional[str]:
    """Committed pretrained artifact for a model config: checkpoints/
    <cfg_id>.params.pkl at the repo root (the reference ships pretrained
    checkpoints as a first-class artifact, README.md:58-64; here they are
    small params-only pickles written by `glamr-export-params`, the
    fallback when no trained results/ version exists)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    p = os.path.join(repo_root, "checkpoints", f"{cfg_id}.params.pkl")
    return p if os.path.isfile(p) else None
