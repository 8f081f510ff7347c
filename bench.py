"""Headline benchmark: end-to-end global recon of a 30 s 30 fps clip (900
frames, 2 persons) with the glamr_static stage budget (500 Adam iters),
the BASELINE.json flagship workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = frames/sec of the full optimize() call with a warm compile cache
(production sweeps — run_dataset over 24 sequences x seeds — reuse the
compiled stage program across sequences, so warm throughput is the
production number; cold time incl. compile is reported on stderr).

vs_baseline: the reference publishes no numbers (BASELINE.json
"published": {}); baseline is an estimate of the PyTorch reference on its
own hardware: the reference runs 500 sequential Adam closures, each a
full-sequence 6890-vertex SMPL LBS fwd+bwd plus per-window CVAE Python
loops; public GLAMR issue reports put the 30 s demo at ~15 min on a
modern GPU => ~1 frame/sec. vs_baseline = value / 1.0.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: production sweeps and repeat bench runs
    # skip the (minutes-long over the TPU tunnel) compile entirely.
    # Cache EVERYTHING: cold time is dominated by dozens of small helper
    # programs, each under the default 1.0 s persistence threshold, so
    # with the default they recompile every process
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from __graft_entry__ import _synthetic_in_dict
    from glamr_tpu.body import get_smpl
    from glamr_tpu.recon import GlobalReconOptimizer
    from glamr_tpu.utils import Config

    T, P = 900, 2
    in_dict = _synthetic_in_dict(T=T, P=P)
    cfg = Config("glamr_static")
    smpl = get_smpl("body26fk")  # real SMPL if model files present, else synthetic
    opt = GlobalReconOptimizer(cfg, smpl=smpl)

    t0 = time.time()
    opt.optimize(in_dict)
    cold = time.time() - t0
    print(f"cold optimize (incl. compile): {cold:.2f}s", file=sys.stderr)

    # median of 3 warm runs: single samples jitter +-20% over the
    # tunneled-TPU dispatch path
    times = []
    for _ in range(3):
        t0 = time.time()
        opt.optimize(in_dict)
        times.append(time.time() - t0)
    warm = sorted(times)[1]
    print(f"warm optimize (median of {len(times)}): {warm:.2f}s "
          f"(all: {[round(t, 3) for t in times]})", file=sys.stderr)

    fps = T / warm
    print(json.dumps({
        "metric": "end-to-end video frames/sec (30s 30fps clip, glamr_static 500 iters)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 1.0, 2),
    }))


if __name__ == "__main__":
    main()
