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


def run_profile(opt, in_dict, T, P):
    """--profile: roofline table for the hot programs (stage scans, CVAE
    window-scan inference, infiller train step) — achieved FLOP/s and HBM
    bandwidth vs TPU v5e peak via XLA cost analysis (utils/profile.py)."""
    import jax
    import numpy as np

    from glamr_tpu.utils.profile import (TPU_PEAKS, format_table,
                                         profile_jitted, utilization_row)

    opt.enable_profiling()
    opt.optimize(in_dict)  # records each unique program on first run
    prof = opt.profile_results()

    # infiller train step at the production batch size
    from glamr_tpu.models import MotionInfillerConfig, MotionInfillerVAE
    from glamr_tpu.train import init_infiller
    from glamr_tpu.train.trainer import infiller_step_core, make_tx
    from glamr_tpu.utils import Config

    try:
        mf_yaml = Config("motion_infiller_demo")
        mmodel = MotionInfillerVAE(
            MotionInfillerConfig.from_dict(mf_yaml.model_specs))
        tx = make_tx(1e-3)
        rng = jax.random.PRNGKey(0)
        state = init_infiller(mmodel, tx, rng)
        # donation-free jit: the profiler re-invokes the program with the
        # SAME state buffers; the production step (make_infiller_train_step)
        # donates them, which invalidates the inputs after the first call
        # on a real device
        step = jax.jit(infiller_step_core(mmodel, tx, mf_yaml.loss_cfg))
        B, W = 1024, mmodel.cfg.window_len
        r = np.random.default_rng(0)
        batch = {k: jax.device_put(v) for k, v in {
            "in_body_pose": r.standard_normal((B, W, 69)).astype(np.float32),
            "gt_body_pose": r.standard_normal((B, W, 69)).astype(np.float32),
            "frame_mask": np.ones((B, W), np.float32)}.items()}
        step(state, batch, rng)  # compile outside the timed window
        prof["infiller_train_step(bs1024)"] = profile_jitted(
            step, (state, batch, rng),
            force=lambda o: np.asarray(o[1]["loss"]))
    except Exception as e:  # keep the stage rows even if this one dies
        print(f"infiller train-step profile failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    plat = jax.devices()[0].platform
    peaks = TPU_PEAKS["v5e" if plat != "cpu" else "cpu"]
    rows = [utilization_row(k, v, peaks) for k, v in prof.items()]
    print(f"\n== roofline ({plat}; peaks: "
          f"{peaks['flops'] / 1e12:.0f} TFLOP/s bf16, "
          f"{peaks['hbm_bytes'] / 1e9:.0f} GB/s HBM) ==", file=sys.stderr)
    print(format_table(rows), file=sys.stderr)
    out = "out/glamr_tpu/profile.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"platform": plat, "workload": f"T={T} P={P}",
                   "peaks": peaks, "rows": rows}, f, indent=2)
    print(f"wrote {out}", file=sys.stderr)


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

    # persistent compile cache + JAX_PLATFORMS handling (keeps the host
    # 'cpu' backend registered next to the accelerator so host_prep_scope
    # can pin tiny eager init ops off the tunnel — see utils/cache.py)
    from glamr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

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
        # machine-visible series for BOTH scopes so a regression in either
        # can't hide in stderr (the round-2 core slowdown was stderr-only)
        "core_fps": round(T / core_warm, 3),
        "warm_s": round(warm, 3),
        "core_warm_s": round(core_warm, 3),
    }
    if platform != "accelerator":
        out["platform"] = platform
        out["note"] = ("host-CPU fallback run; same workload measured on "
                       "the TPU v5e chip: see BENCH_r01.json (2078 fps, "
                       "optimizer core) / results tables in ROADMAP.md")
    print(json.dumps(out))

    if "--profile" in sys.argv:
        run_profile(opt, in_dict, T, P)


if __name__ == "__main__":
    main()
