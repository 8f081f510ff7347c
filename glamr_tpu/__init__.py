"""glamr_tpu — a TPU-native global occlusion-aware human mesh recovery framework.

A from-scratch JAX/XLA rebuild of the GLAMR pipeline (NVlabs/GLAMR,
CVPR 2022): per-frame pose estimates -> motion infilling (transformer CVAE)
-> global trajectory prediction (LSTM CVAE) -> joint global optimization of
person trajectories and camera extrinsics — all expressed as compiled XLA
programs (scan-based optimizers, batched person/frame axes, shardable over
device meshes) rather than Python loops.

Subpackages
-----------
transforms  rotation/heading algebra + the 11-D local trajectory codec
body        SMPL body model (blend shapes, rigid FK, LBS) in pure jnp
models      motion-infiller and trajectory-predictor CVAEs (flax)
recon       stage-4 global reconstruction optimizer + loss registry
eval        3DPW / Dynamic-H36M metric evaluator
data        AMASS dataset pipeline with occlusion-mask synthesis
train       pjit data/model-parallel training loops
parallel    mesh + sharding helpers
utils       config system, logging
"""

__version__ = "0.1.0"


_SUBPACKAGES = (
    "transforms", "body", "models", "recon", "eval", "data", "train",
    "parallel", "pose_est", "preprocess", "vis", "utils", "cli",
)


def __getattr__(name):
    """Lazy subpackage access: `import glamr_tpu; glamr_tpu.recon...`
    without paying the import cost of unused stacks."""
    if name in _SUBPACKAGES:
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module 'glamr_tpu' has no attribute '{name}'")


def __dir__():
    return sorted(list(globals()) + list(_SUBPACKAGES))
