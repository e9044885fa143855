"""cnc_tpu — a TPU-native rate-distortion-optimized NeRF compression framework.

Built from scratch on JAX/XLA/Pallas with the capabilities of CNC (CVPR'24,
"How Far Can We Compress Instant-NGP-Based NeRF?").  See SURVEY.md at the repo
root for the structural map of the reference this build follows.
"""

from . import config, ops

__version__ = "0.1.0"
