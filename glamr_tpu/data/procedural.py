"""Procedural human-motion generator (gait model) in AMASS format.

The reference trains its CVAEs on AMASS mocap (SURVEY C18/C21), which is
licensed and absent from this image. `synthetic_amass_data` (data/amass.py)
keeps the pipeline runnable but its random-walk poses carry no structure,
so a model trained on it only learns to smooth noise. This module generates
*structured* motion — periodic walking gaits with speed/heading variation,
turning bouts, and idle sway — so that training-to-convergence produces a
meaningful motion prior: the infiller learns periodic limb coordination it
can extrapolate through occlusion gaps, and the trajectory predictor learns
the correlation between gait phase/leg swing and root translation/heading,
which is exactly the structure GLAMR's stage 3 exploits (traj_pred/models/
traj_pred_vae.py predicts the 11-D local trajectory from joint positions).

Family mix (v3, the measured-phantom-walk fix — RESULTS.md ablation):
walk (with slow speed-envelope bouts), run, turn-in-place, circle
(turn-while-moving), stop-and-go, idle (varied static arm configs),
crouch, gesture, march-in-place (leg motion with ZERO translation),
strafe (velocity 90 deg off facing), backstep (velocity opposite facing,
distinct kinematics). Root speed is PHYSICALLY COUPLED to stride
frequency x amplitude in every locomotion family, so pose -> velocity is
a learnable deterministic mapping instead of an independent draw; the
in-place and off-axis families break the "legs swing => root translates
along facing" shortcut that caused the trajectory prior's phantom walk.

Output matches preprocess.amass.process_amass's input schema, so FK joint
positions and the train/test split reuse that code path unchanged.

SMPL joint conventions used here (body frame y-up, facing +z):
hip/knee flexion = rotation about +x/-x, arm lowering = rotation about z.
World frame is z-up: global orient = Rz(heading) @ R_base where R_base is
the axis-permutation quaternion the AMASS preprocessing uses
(axis-angle (1.2092, 1.2092, 1.2092) = 120 deg about (1,1,1), mapping body
+y (up) to world +z and body +z (facing) to world +x).
"""
from __future__ import annotations

import numpy as np

# SMPL joint indices (pose (T, 24, 3) axis-angle; joint 0 = global orient)
L_HIP, R_HIP, SPINE1, L_KNEE, R_KNEE, SPINE2 = 1, 2, 3, 4, 5, 6
L_ANKLE, R_ANKLE, SPINE3, L_FOOT, R_FOOT, NECK = 7, 8, 9, 10, 11, 12
L_COLLAR, R_COLLAR, HEAD, L_SHOULDER, R_SHOULDER = 13, 14, 15, 16, 17
L_ELBOW, R_ELBOW, L_WRIST, R_WRIST = 18, 19, 20, 21

BASE_ORIENT_AA = np.array([1.2092, 1.2092, 1.2092], np.float32)


def _ou_process(rng, T, theta=0.05, sigma=0.02, x0=0.0):
    """Ornstein-Uhlenbeck: smooth, mean-reverting noise."""
    x = np.empty(T, np.float32)
    x[0] = x0
    noise = rng.normal(0, sigma, T).astype(np.float32)
    for t in range(1, T):
        x[t] = x[t - 1] - theta * x[t - 1] + noise[t]
    return x


def _smooth_noise(rng, T, n_joints, sigma):
    """Low-frequency per-joint jitter (cumsum-of-noise, detrended)."""
    x = np.cumsum(rng.normal(0, sigma, (T, n_joints, 3)), axis=0)
    return (x - x.mean(axis=0, keepdims=True)).astype(np.float32)


def _heading_rotvec(heading: np.ndarray) -> np.ndarray:
    """Axis-angle of Rz(heading) @ R_base, per frame. Quaternion compose
    in numpy (host-side data generation; no jax needed)."""
    half_base = np.linalg.norm(BASE_ORIENT_AA) / 2  # = pi/3
    qb = np.concatenate([[np.cos(half_base)],
                         BASE_ORIENT_AA / np.linalg.norm(BASE_ORIENT_AA)
                         * np.sin(half_base)])
    hh = heading / 2
    qz = np.stack([np.cos(hh), np.zeros_like(hh), np.zeros_like(hh),
                   np.sin(hh)], axis=-1)
    # quaternion product qz * qb
    w1, x1, y1, z1 = qz[:, 0], qz[:, 1], qz[:, 2], qz[:, 3]
    w2, x2, y2, z2 = qb
    q = np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)
    # quat -> rotvec
    w = np.clip(q[:, 0], -1.0, 1.0)
    angle = 2 * np.arccos(np.abs(w))
    sign = np.where(w < 0, -1.0, 1.0)
    s = np.sqrt(np.maximum(1 - w * w, 1e-12))
    axis = sign[:, None] * q[:, 1:] / s[:, None]
    return (axis * angle[:, None]).astype(np.float32)


LEG_LEN = 0.85  # m, hip-to-ground; sets the stride-length scale


def _gait_speed(rng, f, a_hip, flight=1.0):
    """Root speed physically coupled to the gait parameters.

    Step length ~ 2 * LEG_LEN * sin(a_hip); two steps per stride cycle at
    f Hz gives speed = 2 f * step_len, times a flight-phase factor for
    running and a small calibration jitter. Keeping pose amplitude ->
    speed a LEARNABLE deterministic mapping (instead of the previous
    independent draws) is what lets the trajectory predictor read
    velocity off the pose rather than lean on its latent — the measured
    phantom-walk failure mode (RESULTS.md, cvae_ablation)."""
    step_len = 2.0 * LEG_LEN * np.sin(a_hip)
    return 2.0 * f * step_len * flight * rng.uniform(0.92, 1.08)


def _gait_pose(rng, T, fps=30.0, envelope=None):
    """Periodic walking-gait body pose (T, 24, 3) and per-frame speed.

    envelope (T,) in [0, ~1.4] modulates stride amplitude AND speed
    coherently over time (accelerate/slow down bouts), so time-varying
    speed stays readable from the pose."""
    f = rng.uniform(0.7, 1.4)                       # stride frequency, Hz
    phase0 = rng.uniform(0, 2 * np.pi)
    phi = 2 * np.pi * f * np.arange(T) / fps + phase0
    env = np.ones(T, np.float32) if envelope is None else envelope
    a_hip0 = rng.uniform(0.25, 0.55)
    a_hip = a_hip0 * env
    a_knee = rng.uniform(0.4, 0.9) * env
    a_arm = a_hip * rng.uniform(0.5, 1.0)
    pose = np.zeros((T, 24, 3), np.float32)
    s, c = np.sin(phi), np.cos(phi)
    # legs: hips antiphase, knee flexes during its swing phase
    pose[:, L_HIP, 0] = a_hip * s
    pose[:, R_HIP, 0] = -a_hip * s
    pose[:, L_KNEE, 0] = a_knee * np.maximum(0.0, c)
    pose[:, R_KNEE, 0] = a_knee * np.maximum(0.0, -c)
    pose[:, L_ANKLE, 0] = -0.3 * a_hip * s
    pose[:, R_ANKLE, 0] = 0.3 * a_hip * s
    # arms: lowered from T-pose, counter-swinging
    pose[:, L_SHOULDER, 2] = -1.2
    pose[:, R_SHOULDER, 2] = 1.2
    pose[:, L_SHOULDER, 0] = -a_arm * s
    pose[:, R_SHOULDER, 0] = a_arm * s
    pose[:, L_ELBOW, 1] = -0.35 - 0.2 * np.maximum(0.0, -s)
    pose[:, R_ELBOW, 1] = 0.35 + 0.2 * np.maximum(0.0, s)
    # torso/head sway at double the stride frequency
    pose[:, SPINE1, 1] = 0.04 * np.sin(2 * phi)
    pose[:, SPINE2, 2] = 0.03 * np.sin(2 * phi + 0.5)
    pose[:, HEAD, 0] = 0.03 * np.sin(2 * phi + 1.0)
    # speed tracks the (possibly time-varying) stride amplitude
    speed = 2.0 * f * 2.0 * LEG_LEN * np.sin(a_hip) \
        * rng.uniform(0.92, 1.08) * (1 + 0.08 * np.sin(2 * phi))
    bob = 0.025 * env * np.sin(2 * phi)
    return pose, speed.astype(np.float32), bob.astype(np.float32)


def _idle_pose(rng, T, varied=False):
    """Standing idle: arms down, slow sway. varied=True randomizes the
    static arm configuration (asymmetric angles, bent elbows, a raised
    hand) so "stationary" spans many pose shapes, not one canonical
    stance — the predictor must recognize stillness from dynamics, not
    from a single memorized silhouette."""
    pose = np.zeros((T, 24, 3), np.float32)
    if varied:
        pose[:, L_SHOULDER, 2] = -rng.uniform(0.7, 1.45)
        pose[:, R_SHOULDER, 2] = rng.uniform(0.7, 1.45)
        pose[:, L_ELBOW, 1] = -rng.uniform(0.1, 1.3)
        pose[:, R_ELBOW, 1] = rng.uniform(0.1, 1.3)
        pose[:, L_SHOULDER, 0] = rng.uniform(-0.4, 0.2)
        pose[:, R_SHOULDER, 0] = rng.uniform(-0.4, 0.2)
        pose[:, SPINE1, 0] = rng.uniform(-0.1, 0.25)
        pose[:, HEAD, 2] = rng.uniform(-0.3, 0.3)
    else:
        pose[:, L_SHOULDER, 2] = -1.25
        pose[:, R_SHOULDER, 2] = 1.25
        pose[:, L_ELBOW, 1] = -0.2
        pose[:, R_ELBOW, 1] = 0.2
    sway = _ou_process(rng, T, theta=0.02, sigma=0.004)
    pose[:, SPINE1, 0] = pose[:, SPINE1, 0] + sway
    pose[:, HEAD, 1] = _ou_process(rng, T, theta=0.02, sigma=0.006)
    speed = np.zeros(T, np.float32)
    return pose, speed, np.zeros(T, np.float32)


def _march_pose(rng, T, fps=30.0):
    """Marching / stepping IN PLACE: alternating knee lifts with zero
    root translation. Breaks the false invariant "legs swing => the
    root translates" that pure locomotion data teaches — the measured
    1.9 m phantom walk on a stationary sequence (RESULTS.md) is exactly
    that shortcut. Kinematic signature differs from walking: hips flex
    only FORWARD (knee lift, max(0,.)), no fore-aft swing."""
    f = rng.uniform(0.8, 2.0)
    phi = 2 * np.pi * f * np.arange(T) / fps + rng.uniform(0, 2 * np.pi)
    lift = rng.uniform(0.5, 1.1)
    pose = np.zeros((T, 24, 3), np.float32)
    s = np.sin(phi)
    pose[:, L_HIP, 0] = lift * np.maximum(0.0, s)
    pose[:, R_HIP, 0] = lift * np.maximum(0.0, -s)
    pose[:, L_KNEE, 0] = 1.3 * lift * np.maximum(0.0, s)
    pose[:, R_KNEE, 0] = 1.3 * lift * np.maximum(0.0, -s)
    pose[:, L_SHOULDER, 2] = -1.2
    pose[:, R_SHOULDER, 2] = 1.2
    pose[:, L_SHOULDER, 0] = -0.3 * lift * s
    pose[:, R_SHOULDER, 0] = 0.3 * lift * s
    pose[:, L_ELBOW, 1] = -0.6
    pose[:, R_ELBOW, 1] = 0.6
    speed = np.zeros(T, np.float32)
    bob = 0.02 * lift * np.abs(s)
    return pose, speed, bob.astype(np.float32)


def _strafe_pose(rng, T, fps=30.0):
    """Side-stepping: hip ab/adduction oscillation, lateral translation
    at 90 deg to facing. Decorrelates velocity DIRECTION from heading
    (all other families move along facing), and its speed is coupled to
    the abduction amplitude like the gait families."""
    f = rng.uniform(0.6, 1.2)
    phi = 2 * np.pi * f * np.arange(T) / fps + rng.uniform(0, 2 * np.pi)
    a_ab = rng.uniform(0.15, 0.35)              # hip abduction amplitude
    side = 1.0 if rng.uniform() < 0.5 else -1.0
    pose = np.zeros((T, 24, 3), np.float32)
    s = np.sin(phi)
    # legs swing laterally (z-axis for hips ~ ab/adduction), slight knee
    pose[:, L_HIP, 2] = -side * a_ab * (1 + s) / 2
    pose[:, R_HIP, 2] = -side * a_ab * (1 - s) / 2
    pose[:, L_KNEE, 0] = 0.25 * a_ab * np.maximum(0.0, s)
    pose[:, R_KNEE, 0] = 0.25 * a_ab * np.maximum(0.0, -s)
    pose[:, L_SHOULDER, 2] = -1.25
    pose[:, R_SHOULDER, 2] = 1.25
    pose[:, L_ELBOW, 1] = -0.3
    pose[:, R_ELBOW, 1] = 0.3
    speed = 2.0 * f * 2.0 * LEG_LEN * np.sin(a_ab) * rng.uniform(0.9, 1.1) \
        * (1 + 0.1 * np.abs(s))
    bob = 0.012 * np.sin(2 * phi)
    drift = side * np.pi / 2                    # velocity 90 deg off facing
    return pose, speed.astype(np.float32), bob.astype(np.float32), drift


def _backstep_pose(rng, T, fps=30.0):
    """Backward walking: velocity opposite facing, with a distinct
    kinematic signature vs forward gait (shorter steps, knee flexes in
    the OPPOSITE half-cycle, upright trunk) so the direction stays
    readable from the pose."""
    f = rng.uniform(0.6, 1.1)
    phi = 2 * np.pi * f * np.arange(T) / fps + rng.uniform(0, 2 * np.pi)
    a_hip = rng.uniform(0.15, 0.3)              # shorter steps than forward
    pose = np.zeros((T, 24, 3), np.float32)
    s, c = np.sin(phi), np.cos(phi)
    pose[:, L_HIP, 0] = a_hip * s
    pose[:, R_HIP, 0] = -a_hip * s
    # knees flex during the BACKWARD reach (sign-flipped vs forward gait)
    pose[:, L_KNEE, 0] = 0.9 * a_hip * np.maximum(0.0, -c)
    pose[:, R_KNEE, 0] = 0.9 * a_hip * np.maximum(0.0, c)
    pose[:, L_ANKLE, 0] = 0.4 * a_hip * s
    pose[:, R_ANKLE, 0] = -0.4 * a_hip * s
    pose[:, L_SHOULDER, 2] = -1.25
    pose[:, R_SHOULDER, 2] = 1.25
    pose[:, L_SHOULDER, 0] = -0.4 * a_hip * s
    pose[:, R_SHOULDER, 0] = 0.4 * a_hip * s
    pose[:, L_ELBOW, 1] = -0.3
    pose[:, R_ELBOW, 1] = 0.3
    speed = 2.0 * f * 2.0 * LEG_LEN * np.sin(a_hip) * rng.uniform(0.85, 1.0) \
        * (1 + 0.08 * np.sin(2 * phi))
    bob = 0.015 * np.sin(2 * phi)
    return pose, speed.astype(np.float32), bob.astype(np.float32)


def _run_pose(rng, T, fps=30.0):
    """Running gait: higher stride frequency, larger flexions, forward
    torso lean, arms pumping at ~90 deg elbows."""
    f = rng.uniform(2.0, 3.0)
    phi = 2 * np.pi * f * np.arange(T) / fps + rng.uniform(0, 2 * np.pi)
    a_hip = rng.uniform(0.6, 0.95)
    a_knee = rng.uniform(1.0, 1.6)
    pose = np.zeros((T, 24, 3), np.float32)
    s, c = np.sin(phi), np.cos(phi)
    pose[:, L_HIP, 0] = a_hip * s
    pose[:, R_HIP, 0] = -a_hip * s
    pose[:, L_KNEE, 0] = a_knee * np.maximum(0.0, c)
    pose[:, R_KNEE, 0] = a_knee * np.maximum(0.0, -c)
    pose[:, L_ANKLE, 0] = -0.35 * a_hip * s
    pose[:, R_ANKLE, 0] = 0.35 * a_hip * s
    pose[:, SPINE1, 0] = rng.uniform(0.15, 0.35)       # forward lean
    pose[:, L_SHOULDER, 2] = -1.1
    pose[:, R_SHOULDER, 2] = 1.1
    pose[:, L_SHOULDER, 0] = -0.7 * a_hip * s
    pose[:, R_SHOULDER, 0] = 0.7 * a_hip * s
    pose[:, L_ELBOW, 1] = -1.2
    pose[:, R_ELBOW, 1] = 1.2
    # at running cadence the pure stride-geometry speed overshoots
    # (peak hip amplitude != effective contact sweep); 0.55 calibrates
    # to real 2-4.5 m/s running for f in [2,3], a_hip in [0.6,0.95]
    speed = _gait_speed(rng, f, a_hip, flight=0.55) \
        * (1 + 0.1 * np.sin(2 * phi))
    bob = 0.05 * np.sin(2 * phi)
    return pose, speed.astype(np.float32), bob.astype(np.float32)


def _crouch_pose(rng, T):
    """Crouched stance (deep knee/hip flexion) with slow sway — the
    non-upright silhouettes occlusion recovery must handle."""
    pose, speed, bob = _idle_pose(rng, T)
    depth = rng.uniform(0.6, 1.3)
    ramp = np.clip(np.arange(T) / max(int(rng.uniform(10, 30)), 1), 0, 1)
    pose[:, L_HIP, 0] += depth * ramp
    pose[:, R_HIP, 0] += depth * ramp
    pose[:, L_KNEE, 0] += 1.5 * depth * ramp
    pose[:, R_KNEE, 0] += 1.5 * depth * ramp
    pose[:, SPINE1, 0] += 0.4 * depth * ramp
    bob = (-0.25 * depth * ramp).astype(np.float32)
    return pose, speed, bob


def _gesture_pose(rng, T, fps=30.0):
    """Standing with an arm raise/wave — decorrelates arm motion from the
    gait cycle so the prior doesn't weld arms to legs."""
    pose, speed, bob = _idle_pose(rng, T)
    side = int(rng.integers(2))
    SH, EL = (L_SHOULDER, L_ELBOW) if side == 0 else (R_SHOULDER, R_ELBOW)
    sign = -1.0 if side == 0 else 1.0
    f = rng.uniform(0.5, 1.5)
    phi = 2 * np.pi * f * np.arange(T) / fps + rng.uniform(0, 2 * np.pi)
    raise_amt = rng.uniform(1.2, 2.2)
    ramp = np.clip(np.arange(T) / max(int(rng.uniform(15, 40)), 1), 0, 1)
    pose[:, SH, 2] += -sign * raise_amt * ramp          # arm up
    pose[:, EL, 1] = sign * (0.4 + 0.35 * np.sin(phi)) * ramp  # wave
    pose[:, HEAD, 1] += 0.05 * np.sin(0.5 * phi)
    return pose, speed, bob


def procedural_motions(num_seqs: int = 64, min_len: int = 120,
                       max_len: int = 600, seed: int = 0,
                       fps: float = 30.0) -> list[dict]:
    """List of {'poses' (T,72), 'trans' (T,3), 'betas' (10,), 'name',
    'mocap_framerate'} — process_amass's input schema."""
    rng = np.random.default_rng(seed)
    motions = []
    for i in range(num_seqs):
        T = int(rng.integers(min_len, max_len + 1))
        kind = rng.choice(["walk", "walk", "walk", "turn", "idle",
                           "run", "stopgo", "crouch", "gesture",
                           "march", "strafe", "backstep", "circle"])
        drift = 0.0  # velocity direction offset from facing (radians)
        if kind == "idle":
            pose, speed, bob = _idle_pose(rng, T,
                                          varied=rng.uniform() < 0.7)
            omega = _ou_process(rng, T, theta=0.05, sigma=0.002)
        elif kind == "crouch":
            pose, speed, bob = _crouch_pose(rng, T)
            omega = _ou_process(rng, T, theta=0.05, sigma=0.002)
        elif kind == "gesture":
            pose, speed, bob = _gesture_pose(rng, T, fps)
            omega = _ou_process(rng, T, theta=0.05, sigma=0.003)
        elif kind == "march":
            pose, speed, bob = _march_pose(rng, T, fps)
            omega = _ou_process(rng, T, theta=0.05, sigma=0.004)
        elif kind == "strafe":
            pose, speed, bob, drift = _strafe_pose(rng, T, fps)
            omega = _ou_process(rng, T, theta=0.05, sigma=0.004)
        elif kind == "backstep":
            pose, speed, bob = _backstep_pose(rng, T, fps)
            drift = np.pi                       # velocity opposite facing
            omega = _ou_process(rng, T, theta=0.04, sigma=0.008)
        elif kind == "run":
            pose, speed, bob = _run_pose(rng, T, fps)
            omega = _ou_process(rng, T, theta=0.03, sigma=0.01)
        else:
            # long-range speed diversity: slow accelerate/decelerate
            # bouts, with pose amplitude tracking speed (see _gait_pose)
            env = None
            if kind == "turn":
                # turning in place: SMALL shuffle steps — pose amplitude
                # scaled down consistently with the near-zero speed
                # (a full-amplitude gait at zero speed would reintroduce
                # the pose/speed contradiction this generator fixes; the
                # r04 prior walked 7 m on a turn-in-place sequence)
                env = np.full(T, rng.uniform(0.1, 0.35), np.float32)
            elif kind == "walk" and rng.uniform() < 0.5:
                g = _ou_process(rng, T, theta=0.01, sigma=0.015)
                env = np.clip(1.0 + 3.0 * g, 0.35, 1.4).astype(np.float32)
            pose, speed, bob = _gait_pose(rng, T, fps, envelope=env)
            if kind == "turn":
                omega = np.full(T, rng.uniform(-1.2, 1.2), np.float32) \
                    + _ou_process(rng, T, theta=0.05, sigma=0.01)
            elif kind == "circle":
                # sustained curved locomotion: constant-curvature path at
                # full walking speed (turn-while-moving, not turn-in-place)
                omega = np.full(T, rng.uniform(0.25, 1.0)
                                * (1 if rng.uniform() < 0.5 else -1),
                                np.float32) \
                    + _ou_process(rng, T, theta=0.05, sigma=0.005)
            elif kind == "stopgo":
                # walking with halts: speed gated by a smooth 0/1
                # envelope; pose amplitude follows so the legs actually
                # stop (the infiller must bridge motion/stillness
                # transitions, not just steady gait)
                gate = _ou_process(rng, T, theta=0.02, sigma=0.03)
                env = (1.0 / (1.0 + np.exp(-8.0 * gate))).astype(np.float32)
                speed = (speed * env).astype(np.float32)
                idle, _, _ = _idle_pose(rng, T)
                e3 = env[:, None, None]
                pose = e3 * pose + (1.0 - e3) * idle  # halt -> idle stance
                bob = (bob * env).astype(np.float32)
                omega = _ou_process(rng, T, theta=0.03, sigma=0.01)
            else:
                omega = _ou_process(rng, T, theta=0.03, sigma=0.015)
        # lean into the turn: centripetal roll ~ atan(v*omega/g), the
        # postural cue that makes angular velocity OBSERVABLE from pose
        # (real locomotion has it; without it the prior cannot know turn
        # rate and heading drifts — circle final_err 7.4 m in the before
        # calibration). Roll about the body facing axis, split over the
        # spine; ~8 deg for a 1.4 m/s walk on a 1.4 m-radius circle,
        # negligible for straight or stationary motion.
        lean = np.arctan(speed * omega / 9.81).astype(np.float32)
        pose[:, SPINE1, 2] += 0.6 * lean
        pose[:, SPINE2, 2] += 0.4 * lean

        # small unstructured jitter so the prior isn't a pure sinusoid
        pose[:, 1:] += _smooth_noise(rng, T, 23, 0.004)

        heading = rng.uniform(0, 2 * np.pi) + np.cumsum(omega) / fps
        vdir = heading + drift
        dxy = (speed / fps)[:, None] * np.stack(
            [np.cos(vdir), np.sin(vdir)], axis=-1)
        xy = np.cumsum(dxy, axis=0) + rng.uniform(-2, 2, 2)
        z = rng.uniform(0.88, 0.96) + bob
        trans = np.concatenate([xy, z[:, None]], axis=-1).astype(np.float32)

        pose[:, 0] = _heading_rotvec(heading.astype(np.float32))
        motions.append({
            "poses": pose.reshape(T, 72),
            "trans": trans,
            "betas": rng.normal(0, 0.8, 16).astype(np.float32),
            "name": f"proc_{kind}_{i:04d}",
            "mocap_framerate": fps,
        })
    return motions


def procedural_amass_data(num_seqs: int = 64, min_len: int = 120,
                          max_len: int = 600, seed: int = 0, smpl=None,
                          train_ratio: float = 0.9):
    """(train, test, train_jpos, test_jpos) AMASS-format dicts with FK
    joint positions, via preprocess.amass.process_amass (30 fps already,
    so resampling is identity)."""
    import jax

    from ..preprocess.amass import process_amass

    motions = procedural_motions(num_seqs, min_len, max_len, seed)
    # pin the per-sequence FK prep to the CPU backend: many small eager
    # ops; dispatching them to a (possibly remote) accelerator costs a
    # round-trip each
    from ..utils.cache import host_prep_scope
    with host_prep_scope():
        return process_amass(motions, smpl=smpl, source_fps=30.0,
                             target_fps=30.0, min_seq_len=min(60, min_len),
                             train_ratio=train_ratio, seed=seed)
