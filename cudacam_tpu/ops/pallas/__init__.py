"""Pallas TPU kernel backend.

The reference's native compute core is two CUDA files of hand-tiled stencil
kernels (src/cvp/cannyEdgeD.cu, src/cvp/cannyEdgeH.cu). This package is the
TPU-native re-creation: VMEM-resident fused stencil slabs with double-buffered
HBM DMA (feedforward.py) and a legacy sequential-sweep hysteresis kernel with
in-VMEM block saturation (hysteresis.py).
"""
from cudacam_tpu.ops.pallas.feedforward import (
    feed_forward_all_stages,
    feed_forward_to_stage,
)
from cudacam_tpu.ops.pallas.hysteresis import hysteresis_pallas
from cudacam_tpu.ops.pallas.canny import canny_to_stage_pallas

__all__ = [
    "feed_forward_all_stages",
    "feed_forward_to_stage",
    "hysteresis_pallas",
    "canny_to_stage_pallas",
]
