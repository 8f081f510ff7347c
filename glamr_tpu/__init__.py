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
