"""Roofline profiling helpers: XLA cost analysis + forced-completion
timing for compiled programs, reported against TPU peak rates.

The reference ships no utilization reporting at all (its perf story is
wall-clock prints, e.g. global_recon_model.py:566-570); on TPU "fast as
the hardware allows" is checkable — XLA's own cost model gives FLOPs and
bytes-accessed per compiled program, and dividing by measured device
time yields MFU / achieved-HBM-bandwidth directly.
"""
from __future__ import annotations

import time

import numpy as np

# Peak rates used for utilization denominators. TPU v5e (v5 lite):
# 197 TFLOP/s bf16 MXU, 819 GB/s HBM. f32 matmuls run through the same
# MXU at reduced rate, so bf16 peak is the honest (conservative)
# denominator for mixed-precision programs.
TPU_PEAKS = {
    "v5e": {"flops": 197e12, "hbm_bytes": 819e9},
    # virtual/CPU runs: no meaningful peak — report raw numbers only
    "cpu": {"flops": float("nan"), "hbm_bytes": float("nan")},
}


def profile_jitted(fn, args, force, repeats: int = 3) -> dict:
    """Cost-analyze and time one compiled program.

    fn: a jax.jit-wrapped callable. args: example inputs (device-resident
    preferred). force: callable(output) that fetches a small value, forcing
    the program to completion (block_until_ready can return early over a
    tunneled device). Returns {"flops", "bytes", "seconds", ...}.
    """
    entry = {}
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        entry["flops"] = float(ca.get("flops", float("nan")))
        entry["bytes"] = float(ca.get("bytes accessed", float("nan")))
    except Exception as e:  # plugin backends may not expose cost analysis
        entry["cost_analysis_error"] = f"{type(e).__name__}: {e}"
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        force(out)
        ts.append(time.time() - t0)
    entry["seconds"] = float(sorted(ts)[len(ts) // 2])
    return entry


def utilization_row(name: str, entry: dict, peaks: dict) -> dict:
    """Derive achieved rates + utilization fractions for one program."""
    s = entry.get("seconds", float("nan"))
    flops = entry.get("flops", float("nan"))
    byts = entry.get("bytes", float("nan"))
    row = {
        "program": name,
        "seconds": round(s, 4),
        "gflops": round(flops / 1e9, 2) if np.isfinite(flops) else None,
        "gbytes": round(byts / 1e9, 3) if np.isfinite(byts) else None,
        "achieved_tflops": (round(flops / s / 1e12, 3)
                            if np.isfinite(flops) and s > 0 else None),
        "achieved_gbs": (round(byts / s / 1e9, 2)
                         if np.isfinite(byts) and s > 0 else None),
    }
    if np.isfinite(peaks.get("flops", float("nan"))) and row["achieved_tflops"]:
        row["mfu_pct"] = round(100 * flops / s / peaks["flops"], 2)
    if np.isfinite(peaks.get("hbm_bytes", float("nan"))) and row["achieved_gbs"]:
        row["hbm_pct"] = round(100 * byts / s / peaks["hbm_bytes"], 2)
    if np.isfinite(flops) and np.isfinite(byts) and byts > 0:
        # operational intensity vs the machine's ridge point tells which
        # wall the program is against
        row["flops_per_byte"] = round(flops / byts, 2)
    if "cost_analysis_error" in entry:
        row["cost_analysis_error"] = entry["cost_analysis_error"]
    return row


def format_table(rows: list[dict]) -> str:
    cols = ["program", "seconds", "achieved_tflops", "mfu_pct",
            "achieved_gbs", "hbm_pct", "flops_per_byte"]
    lines = [" | ".join(f"{c:>16}" for c in cols)]
    for r in rows:
        lines.append(" | ".join(
            f"{str(r.get(c, '-')):>16}" for c in cols))
    return "\n".join(lines)
