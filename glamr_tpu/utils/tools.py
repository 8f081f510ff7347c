"""Small host-side helpers (reference: lib/utils/tools.py)."""
from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np


class AverageMeter:
    """Running weighted average (reference tools.py:9-33)."""

    def __init__(self, val=0.0, count: int = 0):
        self.val = val
        self.count = count
        self.avg = val
        self.sum = val * count if count > 0 else val * 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum = self.sum + val * n
        self.count += n
        self.avg = self.sum / self.count if self.count > 0 else self.sum


def find_consecutive_runs(arr) -> list:
    """Split sorted indices into [start, end] runs (reference tools.py:61-92)."""
    arr = np.asarray(arr)
    if arr.size == 0:
        return []
    breaks = np.where(np.diff(arr) != 1)[0]
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [arr.size - 1]])
    return [[int(arr[s]), int(arr[e])] for s, e in zip(starts, ends)]


def resolve_results_dir(root: str) -> str:
    """Resolve a (possibly relative) results_root_dir for READING
    checkpoints. Relative roots are tried against the CWD first (the
    reference runs everything from the repo root, run_demo.py:1-2), then
    against this package's repo root — so harnesses that chdir into a
    scratch workdir (e.g. scripts/eval_synthetic_sweep.py, which must run
    run_dataset against its own datasets/ tree) still find the trained
    checkpoints. Writers (cli/train.py) stay CWD-relative on purpose."""
    if os.path.isabs(root) or os.path.isdir(root):
        return root
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    alt = os.path.join(repo_root, root)
    return alt if os.path.isdir(alt) else root


def find_last_version(base_dir: str) -> int:
    """Largest version_N subdir index, -1 if none (tools.py:41-58)."""
    if not os.path.isdir(base_dir):
        return -1
    best = -1
    for d in os.listdir(base_dir):
        m = re.fullmatch(r"version_(\d+)", d)
        if m:
            best = max(best, int(m.group(1)))
    return best


def get_checkpoint_path(cp_dir: str, cp: str = "last") -> Optional[str]:
    """Resolve a checkpoint selection ('last' / 'best' / epoch number) to a
    file path (reference tools.py:94-104). Checkpoints are orbax dirs or
    .ckpt/.pkl files named epoch=N / best / last."""
    if not os.path.isdir(cp_dir):
        return None
    entries = sorted(os.listdir(cp_dir))
    if not entries:
        return None
    if cp == "best":
        hits = [e for e in entries if "best" in e]
        if hits:
            return os.path.join(cp_dir, hits[-1])
        cp = "last"
    if cp == "last":
        epochs = []
        for e in entries:
            m = re.search(r"(?:epoch[=_-])(\d+)", e)
            if m:
                epochs.append((int(m.group(1)), e))
        if epochs:
            return os.path.join(cp_dir, max(epochs)[1])
        return os.path.join(cp_dir, entries[-1])
    hits = [e for e in entries if str(cp) in e]
    return os.path.join(cp_dir, hits[-1]) if hits else None


def find_checkpoint_across_versions(base_dir: str,
                                    cp: str = "best") -> Optional[str]:
    """Latest version_N that actually HAS a checkpoint, newest-first.

    A results tree can legitimately contain checkpoint-less versions
    (interrupted runs, committed log-only artifacts); resolving only the
    largest version_N then silently falls through to random init. Walk
    back until a version with a resolvable checkpoint is found."""
    v = find_last_version(base_dir)
    while v >= 0:
        p = get_checkpoint_path(
            os.path.join(base_dir, f"version_{v}", "checkpoints"), cp)
        if p is not None:
            return p
        v -= 1
    return None
