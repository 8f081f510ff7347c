"""Headline benchmark: end-to-end global recon of a 30 s 30 fps clip (900
frames, 2 persons) with the glamr_static stage budget (500 Adam iters),
the BASELINE.json flagship workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scope matches the reference demo pipeline (run_demo.py:52-82 ->
global_recon_model.py:153-159,353): the timed optimize() includes the
CVAE half of the flagship graph — motion-infiller window scans +
trajectory-predictor decode during init (flag_infer_motion_traj stays
active; the joint model is loaded from trained checkpoints when present,
randomly-initialized otherwise — identical compute either way) — plus
all optimization stages. The optimization-core-only number (no joint
model, the round-1 headline) is reported on stderr for comparison.

value = frames/sec of the full optimize() call with a warm compile cache
(production sweeps — run_dataset over 24 sequences x seeds — reuse the
compiled stage program across sequences, so warm throughput is the
production number; cold time incl. compile is reported on stderr).

vs_baseline: value / measured reference throughput. BASELINE.json
"measured" records the PyTorch reference (/root/reference
global_recon_model.py optimize, real unbound methods, torch CPU — see
scripts/measure_ref_baseline.py + BASELINE.md for methodology) on THIS
machine and the SAME synthetic workload; that measurement excludes the
reference's CVAE inference (no trained torch checkpoints exist here), so
it under-counts reference cost => vs_baseline is conservative. Falls
back to the 1 fps public-issue-report estimate if no measurement exists.
"""
import json
import os
import sys
import time


def main():
    from glamr_tpu.utils.cache import accelerator_usable

    platform = "accelerator"
    if not accelerator_usable():
        # honest degraded mode: same workload on the host CPU (the
        # measured torch reference baseline ran on this same CPU, so
        # vs_baseline stays same-hardware apples-to-apples). Triggers on
        # a dead tunnel relay, a TPU claim held by another process, or
        # libtpu client/terminal version skew — all of which would
        # otherwise hang or kill the bench at jax.devices()
        os.environ["JAX_PLATFORMS"] = "cpu"
        platform = "cpu-fallback (TPU tunnel unusable)"
        print("TPU unusable (dead tunnel / held claim / version skew) -- "
              "benchmarking on host CPU", file=sys.stderr)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # platform plugins rewrite jax_platforms at import; restore
        # env-var semantics (see glamr_tpu/utils/cache.py)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

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
    from glamr_tpu.models import load_joint_model
    from glamr_tpu.recon import GlobalReconOptimizer
    from glamr_tpu.utils import Config

    T, P = 900, 2
    in_dict = _synthetic_in_dict(T=T, P=P)
    cfg = Config("glamr_static")
    smpl = get_smpl("body26fk")  # real SMPL if model files present, else synthetic

    jm = load_joint_model(Config(cfg.grecon_model_specs["motion_traj_cfg"]),
                          smpl=smpl)
    opt = GlobalReconOptimizer(cfg, joint_model=jm, smpl=smpl)
    assert opt.flag_infer_motion_traj, "CVAE half must be in the timed graph"

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

    # optimization-core-only comparison point (round-1 headline scope)
    core_opt = GlobalReconOptimizer(cfg, smpl=smpl)
    core_in = _synthetic_in_dict(T=T, P=P)
    core_opt.optimize(core_in)
    t0 = time.time()
    core_opt.optimize(core_in)
    core_warm = time.time() - t0
    print(f"core-only warm optimize (no CVAE): {core_warm:.2f}s "
          f"({T / core_warm:.0f} fps)", file=sys.stderr)

    baseline_fps = 1.0  # estimate fallback (public issue reports, ~1 fps)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            measured = json.load(f).get("measured", {})
        if "reference_fps" in measured:
            baseline_fps = float(measured["reference_fps"])
            print(f"baseline: measured reference {baseline_fps:.3f} fps "
                  f"({measured.get('methodology', '')})", file=sys.stderr)
    except Exception as e:
        print(f"baseline read failed ({e}); using 1 fps estimate",
              file=sys.stderr)

    fps = T / warm
    out = {
        "metric": "end-to-end video frames/sec incl. CVAE infer "
                  "(30s 30fps clip, glamr_static 500 iters)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline_fps, 2),
    }
    if platform != "accelerator":
        out["platform"] = platform
        out["note"] = ("host-CPU fallback run; same workload measured on "
                       "the TPU v5e chip: see BENCH_r01.json (2078 fps, "
                       "optimizer core) / results tables in ROADMAP.md")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
