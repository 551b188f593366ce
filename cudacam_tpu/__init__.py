"""cudacam_tpu — a TPU-native real-time Canny edge-detection framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the CUDA
desktop app axoloto/CudaCam (see SURVEY.md), re-architected for TPUs:
blocked Pallas stencil kernels, an on-device lax.while_loop hysteresis fixed
point, device-resident frame ring buffers, and shard_map tiling with halo
exchange over ICI for multi-chip / multi-host scaling.
"""
from cudacam_tpu.config import CannyConfig
from cudacam_tpu.stages import CANDIDATE_EDGE, CANNY_STAGE_NAMES, FINAL_EDGE, NO_EDGE, CannyStage

__version__ = "0.2.0"

__all__ = [
    "CannyConfig",
    "CannyStage",
    "CANNY_STAGE_NAMES",
    "FINAL_EDGE",
    "CANDIDATE_EDGE",
    "NO_EDGE",
    "__version__",
]
