"""gbp_poplar_tpu — TPU-native Gaussian Belief Propagation bundle adjustment
and incremental SLAM.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CVPR 2020
"Bundle Adjustment on a Graph Processor" reference (joeaortiz/gbp-poplar):
reprojection factor graphs solved by synchronous GBP in information form, with
Huber robustification, message damping, per-factor relinearisation, prior
annealing, and incremental keyframe insertion — re-designed for TPUs as dense
batched tensor ops over the edge/variable axes, sharded across device meshes
with jax.sharding.
"""

from .config import GBPConfig, InitConfig  # noqa: F401

__version__ = "0.1.0"
