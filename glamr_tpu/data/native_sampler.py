"""ctypes binding for the native AMASS batch sampler (native/sampler.c).

Compiles the C library on first use (gcc -O3 -shared) into a cache dir
and exposes `NativeSampler`, a drop-in accelerator for
AMASSDataset.batch: the window crop + occlusion-mask synthesis for a
whole batch happens in one C call instead of a per-sample Python loop.
Falls back silently if no C toolchain is available (AMASSDataset keeps
its Python path).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "sampler.c")
_LIB_CACHE = os.path.expanduser("~/.cache/glamr_tpu")


def _build_lib() -> Optional[str]:
    os.makedirs(_LIB_CACHE, exist_ok=True)
    lib = os.path.join(_LIB_CACHE, "libglamr_sampler.so")
    if os.path.isfile(lib) and os.path.getmtime(lib) >= os.path.getmtime(_SRC):
        return lib
    try:
        subprocess.run(
            ["gcc", "-O3", "-march=native", "-fPIC", "-shared", _SRC, "-o", lib],
            check=True, capture_output=True)
        return lib
    except Exception:
        return None


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        path = _build_lib()
        if path is None:
            _lib = False
            return None
        _lib = ctypes.CDLL(path)
        _lib.sample_batch.restype = None
        p = ctypes.POINTER
        _lib.sample_batch.argtypes = [
            p(ctypes.c_float), p(ctypes.c_int64), p(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64,
            p(ctypes.c_float), p(ctypes.c_float),
            p(ctypes.c_float), p(ctypes.c_float),
        ]
    return _lib or None


class NativeSampler:
    """Holds the concatenated theta buffer + sampling tables for one
    dataset and fills batches via the C kernel."""

    def __init__(self, data: dict, seq_prob: Optional[np.ndarray] = None):
        seqs = list(data.values())
        self.theta = np.ascontiguousarray(
            np.concatenate(seqs, axis=0), np.float32)
        lengths = np.array([s.shape[0] for s in seqs], np.int64)
        self.offsets = np.zeros(len(seqs) + 1, np.int64)
        np.cumsum(lengths, out=self.offsets[1:])
        if seq_prob is None:
            seq_prob = np.full(len(seqs), 1.0 / len(seqs))
        self.cumprob = np.ascontiguousarray(np.cumsum(seq_prob), np.float64)
        self.lib = get_lib()

    @property
    def available(self) -> bool:
        return self.lib is not None

    def batch(self, seed: int, batch_size: int, seq_len: int,
              mask_spec: Optional[dict] = None) -> dict:
        B, S = batch_size, seq_len
        out_theta = np.empty((B, S, 85), np.float32)
        out_ibp = np.empty((B, S, 69), np.float32)
        out_fm = np.empty((B, S), np.float32)
        out_lm = np.empty((B, S), np.float32)
        if mask_spec:
            pf = int(mask_spec.get("preserve_first_n", 1))
            pl = int(mask_spec.get("preserve_last_n", 0))
            mn = int(mask_spec["min_drop_len"])
            mx = int(mask_spec["max_drop_len"])
        else:
            pf = pl = 0
            mn = mx = -1
        fp = ctypes.POINTER(ctypes.c_float)
        self.lib.sample_batch(
            self.theta.ctypes.data_as(fp),
            self.offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.cumprob.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(self.offsets) - 1, B, S, pf, pl, mn, mx,
            ctypes.c_uint64(seed),
            out_theta.ctypes.data_as(fp), out_ibp.ctypes.data_as(fp),
            out_fm.ctypes.data_as(fp), out_lm.ctypes.data_as(fp),
        )
        return {
            "trans": out_theta[..., :3],
            "pose": out_theta[..., 3:75],
            "shape": out_theta[..., 75:],
            "gt_body_pose": out_theta[..., 6:75],
            "in_body_pose": out_ibp,
            "frame_mask": out_fm,
            "frame_loss_mask": out_lm[..., None],
        }
