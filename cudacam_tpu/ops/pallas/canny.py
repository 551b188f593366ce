"""Whole-pipeline glue for the Pallas backend.

Mirrors xla_ops.canny_to_stage's cumulative run-to-stage-k contract
(reference dispatch: cannyEdgeH.cu:49-120) on the Pallas kernels:

* MONO..THRESH is ONE fused Pallas kernel (feedforward.py) whenever the
  frame's dimensions meet the DMA granules (h % 8 == 0, w % 128 == 0 —
  every production size: 1080p/720p/4K/8K): the kernel ingests the RAW
  planar BGR frame and fuses the fixed-point mono conversion into the slab,
  so the frame makes exactly ONE trip out of HBM with no XLA pre-pass (the
  reference's one-upload property, README.md:14, minus even its separate
  rgb2mono kernel). Off-granule sizes, grayscale configs, and the MONO
  display stage fall back to the XLA mono pass feeding the mono kernel;
* GAUSSIAN..THRESH runs in that same fused kernel either way;
* HYSTER runs the fused Pallas hysteresis kernel (hysteresis_fused.py):
  pack + both convergence phases + unpack in ONE kernel, bit-identical to
  the canonical bit-packed loop because both execute bitpack._make_ops'
  shared round schedule (1080p scene: 109 -> 71 us device time). Frames
  whose shape or packed state don't fit the kernel (off-granule sizes,
  8K) fall back to the XLA loop (ops/bitpack.py). (The sequential-sweep
  Pallas kernel in hysteresis.py remains available as an independently
  derived implementation, but measures ~6x slower on real scenes:
  docs/performance.md.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cudacam_tpu.config import CannyConfig
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.ops.bitpack import hysteresis_packed
from cudacam_tpu.ops.pallas.feedforward import (
    feed_forward_nmsq,
    feed_forward_to_stage,
)
from cudacam_tpu.ops.pallas.hysteresis_fused import (
    batched_ok,
    fused_ok,
    hysteresis_fused,
    hysteresis_fused_batched,
)
from cudacam_tpu.ops.pallas.megakernel import canny_mega_pipeline, mega_ok
from cudacam_tpu.stages import CannyStage


def _hyster(thresh, cfg: CannyConfig, interpret: bool):
    """Backend-internal hysteresis dispatch: the fused kernel when the
    frame qualifies, the canonical XLA loop otherwise — bit-identical
    either way (shared round schedule, see hysteresis_fused.py)."""
    h, w = thresh.shape
    if fused_ok(h, w):
        return hysteresis_fused(
            thresh,
            max_iters=cfg.max_hysteresis_iters,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
            interpret=interpret,
        )
    return hysteresis_packed(
        thresh,
        max_iters=cfg.max_hysteresis_iters,
        dilate_steps=cfg.hysteresis_inner_steps,
        scan_after=cfg.hysteresis_scan_after,
    )


def _sweep_group_size(k: int, h: int, w: int) -> int:
    """Largest number of threshold-sweep tails (<= k) whose section stack
    fits the fused hysteresis kernel's packed-plane budget; 0 when even a
    solo (h, w) frame doesn't qualify (then the sweep uses lax.map over
    _hyster, which picks the chunked XLA loop)."""
    return max((c for c in range(1, k + 1) if batched_ok(c, h, w)), default=0)


def _planar_ok(frame: jnp.ndarray) -> bool:
    """True when the raw (H, W, 3) frame can feed the kernel directly: the
    clamped slab DMAs need h on the 8-row and w on the 128-lane u8 granule
    (feedforward.planar_ingest_mono's contract)."""
    return (
        frame.ndim == 3
        and frame.shape[-1] == 3
        and frame.shape[0] % 8 == 0
        and frame.shape[1] % 128 == 0
    )


def _gray_ok(frame: jnp.ndarray) -> bool:
    """The grayscale analog of :func:`_planar_ok`: a raw (H, W) frame on
    the same DMA granules feeds the megakernel's channel-free ingest."""
    return (
        frame.ndim == 2
        and frame.shape[0] % 8 == 0
        and frame.shape[1] % 128 == 0
    )


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
    if final_stage == CannyStage.MONO:
        return xla_ops.rgb2mono(frame)
    if (
        final_stage == CannyStage.HYSTER
        and (_planar_ok(frame) or _gray_ok(frame))
        and mega_ok(frame.shape[0], frame.shape[1])
    ):
        # The full-run hot path: raw BGR -> edge map in ONE kernel launch
        # (ops/pallas/megakernel.py) — HBM touched twice per frame. A
        # still-growing-at-phase-boundary frame RESUMES phase 2 on the
        # kernel's exported packed state (megakernel._cont_call/_cont_xla
        # via the pipeline's lax.cond — zero recompute; NOT the two-kernel
        # code below, which serves stage display and off-granule shapes),
        # bit-identically (1080p scene: 161 -> 130 us device time,
        # tools/mega_probe.py).
        return canny_mega_pipeline(
            frame if frame.ndim == 2 else jnp.transpose(frame, (2, 0, 1)),
            low,
            high,
            kernel_size=cfg.kernel_size,
            grad_coeff=cfg.grad_coeff,
            norm=cfg.norm,
            parity=cfg.parity,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
            max_iters=cfg.max_hysteresis_iters,
            interpret=interpret,
        )
    ff_stage = (
        final_stage if final_stage != CannyStage.HYSTER else CannyStage.THRESH
    )
    if _planar_ok(frame):
        # Raw-frame ingest: (H, W, 3) u8 is stored channel-major on TPU, so
        # this transpose is a layout view, not a copy — the kernel reads the
        # uploaded bytes directly (one HBM read per frame, zero pre-passes).
        ff_in = jnp.transpose(frame, (2, 0, 1))
    else:
        ff_in = xla_ops.rgb2mono(frame)
    out = feed_forward_to_stage(
        ff_in,
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
        out = _hyster(out, cfg, interpret)
    return out


def threshold_sweep_pallas(
    frame: jnp.ndarray,
    lows: jnp.ndarray,
    highs: jnp.ndarray,
    cfg: CannyConfig,
    interpret: bool = False,
):
    """Threshold sweep on the PRODUCTION kernels (BASELINE.json config 3):
    one fused feed-forward pass emits the threshold-independent state
    (``keep * g``, feedforward.feed_forward_nmsq), then only the
    data-dependent tail — a scalar-bound compare plus the fused
    hysteresis — runs per (low, high) pair. Bit-identical to
    xla_ops.threshold_sweep (same scalar-bound derivations, same
    hysteresis schedule); the reference would need K full kernel-chain
    relaunches (cannyEdgeH.cu:49-120).

    Returns (maps, edge_counts): (K, H, W) uint8 and (K,) int32."""
    import numpy as np

    from cudacam_tpu.stages import CANDIDATE_EDGE, FINAL_EDGE, NO_EDGE

    if _planar_ok(frame):
        ff_in = jnp.transpose(frame, (2, 0, 1))
    else:
        ff_in = xla_ops.rgb2mono(frame)
    kg = feed_forward_nmsq(
        ff_in,
        kernel_size=cfg.kernel_size,
        grad_coeff=cfg.grad_coeff,
        norm=cfg.norm,
        interpret=interpret,
    )

    def thresh_map(lo, hi):
        if cfg.parity == "reference":
            # keep*g >= bound(t) == keep & (g >= bound): bound >= 1 always
            # (xla_ops.threshold_magnitude_bound), and suppressed pixels
            # hold kg == 0.
            lo_b = xla_ops.threshold_magnitude_bound(lo, cfg.grad_coeff, cfg.norm)
            hi_b = xla_ops.threshold_magnitude_bound(hi, cfg.grad_coeff, cfg.norm)
            fin, cand = kg >= hi_b, kg >= lo_b
        else:
            # opencv parity: strict > against the (clamped, squared-for-l2)
            # raw-magnitude thresholds; kg > 0 implies keep.
            lo8 = jnp.clip(lo.astype(jnp.int32), 0, 2048)
            hi8 = jnp.clip(hi.astype(jnp.int32), 0, 2048)
            lo_c = lo8 * lo8 if cfg.norm == "l2" else lo8
            hi_c = hi8 * hi8 if cfg.norm == "l2" else hi8
            fin, cand = kg > hi_c, kg > lo_c
        return jnp.where(
            fin,
            jnp.uint8(FINAL_EDGE),
            jnp.where(cand, jnp.uint8(CANDIDATE_EDGE), jnp.uint8(NO_EDGE)),
        )

    lows = jnp.asarray(lows, jnp.int32)
    highs = jnp.asarray(highs, jnp.int32)
    k = lows.shape[0]
    h, w = kg.shape
    g = _sweep_group_size(k, h, w)
    if g <= 1:
        # Section STACKING doesn't pay here: either only one section fits
        # the stacked kernel's packed-plane budget (g == 1, e.g. 4K — the
        # tails still run the solo fused kernel, one launch each), or the
        # frame doesn't fit the fused kernel at all (8K — _hyster falls
        # to the chunked XLA loop). Tails dispatch per pair via lax.map.
        def tail(pair):
            lo, hi = pair
            return _hyster(thresh_map(lo, hi), cfg, interpret)

        # lax.map, not vmap: the fused hysteresis kernel's manual DMA grid
        # doesn't vectorise (same reason the engine batches with lax.map).
        maps = jax.lax.map(tail, (lows, highs))
    else:
        # Batched tails: ceil(k/g) stacked-section kernel launches
        # (hysteresis_fused_batched), each converging g maps at once.
        # Measured at 1080p/K=16: 2.75 -> ~1.2 ms — the lax.map above
        # cost ~80 us PER ITERATION on top of the 84 us tail itself
        # (tools/sweep_probe.py). A short last group repeats the final
        # pair so every launch shares one kernel shape (one Mosaic
        # compile); duplicate outputs are dropped.
        n_groups = -(-k // g)
        g = -(-k // n_groups)  # rebalance, e.g. K=16 g_max=5 -> 4 groups of 4
        idx = list(range(k)) + [k - 1] * (n_groups * g - k)
        outs = []
        for gi in range(n_groups):
            grp = idx[gi * g : (gi + 1) * g]
            tms = jnp.stack([thresh_map(lows[i], highs[i]) for i in grp])
            outs.append(hysteresis_fused_batched(
                tms,
                max_iters=cfg.max_hysteresis_iters,
                dilate_steps=cfg.hysteresis_inner_steps,
                scan_after=cfg.hysteresis_scan_after,
                interpret=interpret,
            ))
        maps = jnp.concatenate(outs)[:k]
    counts = (maps == np.uint8(FINAL_EDGE)).sum(axis=(1, 2)).astype(jnp.int32)
    return maps, counts


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
    from cudacam_tpu.ops.pallas.feedforward import feed_forward_all_stages

    kw = dict(
        kernel_size=cfg.kernel_size,
        grad_coeff=cfg.grad_coeff,
        norm=cfg.norm,
        parity=cfg.parity,
        interpret=interpret,
    )
    if _planar_ok(frame):
        # Raw ingest: one kernel pass emits ALL FIVE buffers including the
        # in-slab mono conversion — no XLA pre-pass even in display mode.
        mono, blur, grad_disp, nms, thresh = feed_forward_all_stages(
            jnp.transpose(frame, (2, 0, 1)), low, high, **kw
        )
    else:
        mono = xla_ops.rgb2mono(frame)
        blur, grad_disp, nms, thresh = feed_forward_all_stages(
            mono, low, high, **kw
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
        "hyster": _hyster(thresh, cfg, interpret),
    }
