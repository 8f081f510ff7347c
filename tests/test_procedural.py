"""Procedural gait-motion generator (data/procedural.py): the structured
stand-in for AMASS (reference trains on AMASS mocap, SURVEY C18/C21)."""
import numpy as np
import pytest

from glamr_tpu.data.procedural import (BASE_ORIENT_AA, _heading_rotvec,
                                       procedural_amass_data,
                                       procedural_motions)


def test_heading_rotvec_matches_scipy():
    from scipy.spatial.transform import Rotation as R

    h = np.linspace(-3, 7, 17).astype(np.float32)
    got = R.from_rotvec(_heading_rotvec(h))
    want = R.from_euler("z", h[:, None]) * R.from_rotvec(BASE_ORIENT_AA)
    assert (got.inv() * want).magnitude().max() < 1e-5


def test_motions_schema_and_kinds():
    motions = procedural_motions(num_seqs=12, min_len=90, max_len=120, seed=3)
    assert len(motions) == 12
    kinds = set()
    for m in motions:
        T = m["poses"].shape[0]
        assert 90 <= T <= 120
        assert m["poses"].shape == (T, 72)
        assert m["trans"].shape == (T, 3)
        assert m["betas"].shape == (16,)
        assert np.isfinite(m["poses"]).all() and np.isfinite(m["trans"]).all()
        kinds.add(m["name"].split("_")[1])
        # person stays near standing height in the z-up world
        assert 0.8 < m["trans"][:, 2].mean() < 1.05
    assert "walk" in kinds


def test_walk_moves_idle_does_not():
    motions = procedural_motions(num_seqs=20, min_len=120, max_len=150, seed=0)
    walks = [m for m in motions if "walk" in m["name"]]
    idles = [m for m in motions if "idle" in m["name"]]
    assert walks
    for m in walks:
        disp = np.linalg.norm(m["trans"][-1, :2] - m["trans"][0, :2])
        dur = m["poses"].shape[0] / 30.0
        assert disp > 0.4 * dur, f"{m['name']} barely moved: {disp:.2f} m"
    for m in idles:
        disp = np.linalg.norm(m["trans"][-1, :2] - m["trans"][0, :2])
        assert disp < 0.2


def test_walk_direction_follows_heading():
    """Per-frame displacement should point along the heading encoded in
    the global orient (body +z maps to the world heading direction) —
    this is the gait/trajectory correlation the traj predictor learns."""
    from scipy.spatial.transform import Rotation as R

    (m,) = [m for m in procedural_motions(8, 150, 200, seed=1)
            if "walk" in m["name"]][:1]
    fwd_world = R.from_rotvec(m["poses"][:, :3]).apply([0, 0, 1.0])
    step = np.diff(m["trans"][:, :2], axis=0)
    speed = np.linalg.norm(step, axis=-1)
    moving = speed > 1e-4
    cos = (step[moving] * fwd_world[:-1][moving, :2]).sum(-1) / (
        speed[moving] * np.linalg.norm(fwd_world[:-1][moving, :2], axis=-1))
    assert cos.min() > 0.95


def test_speed_coupled_to_gait_amplitude():
    """v3 generator: root speed is a deterministic function of stride
    frequency x amplitude (plus small jitter), so pose -> velocity is
    learnable — the phantom-walk fix (RESULTS.md ablation finding #2)."""
    motions = procedural_motions(num_seqs=120, min_len=120, max_len=150,
                                 seed=7)
    walks = [m for m in motions if "proc_walk" in m["name"]]
    assert len(walks) >= 10
    # hip swing amplitude read back from the pose must predict speed
    amp, spd = [], []
    for m in walks:
        pose = m["poses"].reshape(-1, 24, 3)
        amp.append(np.abs(pose[:, 1, 0]).max())
        step = np.diff(m["trans"][:, :2], axis=0)
        spd.append(np.linalg.norm(step, axis=-1).mean() * 30.0)
    r = np.corrcoef(amp, spd)[0, 1]
    assert r > 0.6, f"speed decoupled from gait amplitude (r={r:.2f})"


def test_march_steps_without_translating():
    motions = procedural_motions(num_seqs=150, min_len=120, max_len=150,
                                 seed=11)
    marches = [m for m in motions if "march" in m["name"]]
    assert marches
    for m in marches:
        pose = m["poses"].reshape(-1, 24, 3)
        # legs genuinely move ...
        assert np.ptp(pose[:, 4, 0]) > 0.5, "march knees do not lift"
        # ... but the root does not translate
        disp = np.linalg.norm(m["trans"][-1, :2] - m["trans"][0, :2])
        assert disp < 0.2, f"march translated {disp:.2f} m"


def test_strafe_and_backstep_velocity_off_facing():
    """Velocity direction decorrelated from heading: strafe moves ~90 deg
    off facing, backstep moves opposite facing."""
    from scipy.spatial.transform import Rotation as R

    motions = procedural_motions(num_seqs=150, min_len=120, max_len=150,
                                 seed=13)
    for want_kind, lo, hi in [("strafe", 60, 120), ("backstep", 150, 180)]:
        seqs = [m for m in motions if want_kind in m["name"]]
        assert seqs, f"no {want_kind} sequences sampled"
        for m in seqs[:3]:
            fwd = R.from_rotvec(m["poses"][:, :3]).apply([0, 0, 1.0])[:, :2]
            step = np.diff(m["trans"][:, :2], axis=0)
            spd = np.linalg.norm(step, axis=-1)
            mask = spd > 1e-3
            cos = (step[mask] * fwd[:-1][mask]).sum(-1) / (
                spd[mask] * np.linalg.norm(fwd[:-1][mask], axis=-1))
            ang = np.degrees(np.arccos(np.clip(np.median(cos), -1, 1)))
            assert lo - 15 <= ang <= hi + 15, \
                f"{m['name']}: velocity {ang:.0f} deg off facing"


def test_amass_pipeline_with_fk():
    train, test, tjpos, sjpos = procedural_amass_data(
        num_seqs=8, min_len=90, max_len=120, seed=0)
    assert train and test
    k = next(iter(train))
    theta = train[k]
    assert theta.shape[1] == 85
    jp, jp_ns = tjpos[k]
    assert jp.shape == (theta.shape[0], 24, 3)
    assert np.isfinite(jp).all() and np.isfinite(jp_ns).all()
    # body-local FK is y-up: the head sits well above the pelvis
    assert jp_ns[:, 15, 1].mean() > 0.4


@pytest.mark.slow
def test_train_cli_procedural_traj_device(tmp_path, monkeypatch):
    """traj_pred training through the CLI with procedural data and the
    device-resident raw-theta path (FK inside the jitted step)."""
    monkeypatch.chdir(tmp_path)
    from glamr_tpu.cli import train as train_cli

    train_cli.main([
        "--model", "traj_pred", "--synthetic_data",
        "--synthetic_kind", "procedural", "--synthetic_num_seqs", "6",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "4",
        "--ndevices", "1", "--device_data", "1",
    ])
    import glob
    cps = glob.glob(str(tmp_path / "results" / "**" / "checkpoints" / "*.pkl"),
                    recursive=True)
    assert cps, "no checkpoint written"
