"""Whole-pipeline glue for the Pallas backend.

Mirrors xla_ops.canny_to_stage's cumulative run-to-stage-k contract
(reference dispatch: cannyEdgeH.cu:49-120) on the Pallas kernels:

* MONO is a pointwise fixed-point conversion — XLA already emits a single
  memory-bound pass for it, so it stays an XLA op feeding the kernel;
* GAUSSIAN..THRESH is ONE fused Pallas kernel (feedforward.py);
* HYSTER adds the bit-packed convergence loop (ops/bitpack.py) — the
  canonical hysteresis shared by every backend. (The sequential-sweep
  Pallas kernel in hysteresis.py remains available as an independently
  derived implementation, but measures ~6x slower on real scenes:
  docs/performance.md.)
"""
from __future__ import annotations

import jax.numpy as jnp

from cudacam_tpu.config import CannyConfig
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.ops.bitpack import hysteresis_packed
from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage
from cudacam_tpu.stages import CannyStage


def canny_to_stage_pallas(
    frame: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    cfg: CannyConfig,
    final_stage: CannyStage,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cumulative pipeline to ``final_stage`` on the Pallas backend; returns
    that stage's (H, W) uint8 display buffer."""
    final_stage = CannyStage(final_stage)
    mono = xla_ops.rgb2mono(frame)
    if final_stage == CannyStage.MONO:
        return mono
    ff_stage = (
        final_stage if final_stage != CannyStage.HYSTER else CannyStage.THRESH
    )
    out = feed_forward_to_stage(
        mono,
        low,
        high,
        kernel_size=cfg.kernel_size,
        grad_coeff=cfg.grad_coeff,
        norm=cfg.norm,
        parity=cfg.parity,
        out_stage=ff_stage,
        interpret=interpret,
    )
    if final_stage == CannyStage.HYSTER:
        out = hysteresis_packed(
            out,
            max_iters=cfg.max_hysteresis_iters,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
        )
    return out


def canny_all_stages_pallas(
    frame: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    cfg: CannyConfig,
    interpret: bool = False,
):
    """Every stage buffer, with each integer display buffer produced by the
    PALLAS kernel (the reference keeps all intermediaries for display,
    README.md:22; round-1 silently ran XLA for this mode). The fused kernel
    emits ALL FOUR stage buffers from ONE pass (multi-output pallas_call,
    feedforward.feed_forward_all_stages) — round-2 originally re-ran the
    kernel once per stage. The float inspection planes (sobel_x/y, grad,
    slope) are display-only derivations computed by XLA from the kernel's
    own blur buffer (bit-exact inputs; see docs/parity.md)."""
    from cudacam_tpu.ops.bitpack import hysteresis_packed as _hp
    from cudacam_tpu.ops.pallas.feedforward import feed_forward_all_stages

    mono = xla_ops.rgb2mono(frame)
    blur, grad_disp, nms, thresh = feed_forward_all_stages(
        mono,
        low,
        high,
        kernel_size=cfg.kernel_size,
        grad_coeff=cfg.grad_coeff,
        norm=cfg.norm,
        parity=cfg.parity,
        interpret=interpret,
    )
    sum_x, sum_y = xla_ops.sobel_sums(blur)
    inv8 = jnp.float32(0.125)
    sx = sum_x.astype(jnp.float32) * inv8
    sy = sum_y.astype(jnp.float32) * inv8
    grad, slope = xla_ops.grad_slope(sx, sy, cfg.grad_coeff, cfg.norm)
    return {
        "mono": mono,
        "gaussian": blur,
        "sobel_x": sx,
        "sobel_y": sy,
        "grad": grad,
        "slope": slope,
        "gradient_display": grad_disp,
        "nms": nms,
        "thresh": thresh,
        "hyster": _hp(
            thresh,
            max_iters=cfg.max_hysteresis_iters,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
        ),
    }
