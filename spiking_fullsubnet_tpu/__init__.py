"""spiking_fullsubnet_tpu: TPU-native speech-enhancement framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
"AudioZen" framework (haoxiangsnr/spiking-fullsubnet): STFT-domain spiking
speech enhancement (Spiking-FullSubNet and friends), trainer runtime, recipes,
metrics, and tools — built TPU-first (pjit/shard_map over device meshes,
lax.scan/Pallas recurrences, MXU-shaped matmuls).
"""

__version__ = "0.1.0"

from . import dsp  # noqa: F401
