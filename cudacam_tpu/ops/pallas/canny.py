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
    fused_ok,
    hysteresis_fused,
    hysteresis_fused_nmsq,
    sweep_fused,
    sweep_ok,
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


#: Program-size guard for the sweep's unrolled solo tails: past this many
#: (low, high) pairs the tails fall back to lax.map (a K-pair sweep
#: unrolls K kernel call sites; 64 is far past any interactive sweep).
_SWEEP_UNROLL_MAX = 64


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
            cont=cfg.continuation,
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


def canny_to_stage_pallas_batched(
    frames: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    cfg: CannyConfig,
    final_stage: CannyStage,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched (B, H, W[, C]) dispatch on the Pallas backend. The full-run
    hot path (HYSTER at mega-eligible shapes) runs the whole batch in ONE
    resident megakernel launch (megakernel.canny_mega_batched — frames as
    grid steps, the sweep_fused pattern; r5: removes lax.map's ~16
    us/frame dispatch overhead, engine._map_batch's r4 measurement).
    Everything else keeps the lax.map form (Pallas manual DMA grids don't
    vectorise under vmap)."""
    from cudacam_tpu.ops.pallas.megakernel import (
        canny_mega_pipeline_batched,
    )

    final_stage = CannyStage(final_stage)
    per_frame_ok = (
        (_planar_ok(frames[0]) if frames.ndim == 4 else _gray_ok(frames[0]))
        if frames.shape[0] > 0
        else False
    )
    if (
        final_stage == CannyStage.HYSTER
        and per_frame_ok
        and mega_ok(frames.shape[1], frames.shape[2])
    ):
        planar = (
            jnp.transpose(frames, (0, 3, 1, 2))
            if frames.ndim == 4
            else frames
        )
        return canny_mega_pipeline_batched(
            planar,
            low,
            high,
            kernel_size=cfg.kernel_size,
            grad_coeff=cfg.grad_coeff,
            norm=cfg.norm,
            parity=cfg.parity,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
            max_iters=cfg.max_hysteresis_iters,
            cont=cfg.continuation,
            interpret=interpret,
        )
    return jax.lax.map(
        lambda f: canny_to_stage_pallas(
            f, low, high, cfg, final_stage, interpret=interpret
        ),
        frames,
    )


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

    def cmp_bounds(lo, hi):
        """The strict-> comparison bounds on the kg plane for one pair —
        kg > hi_cmp is FINAL, kg > lo_cmp is at-least-CANDIDATE — in
        either parity domain (same derivations as
        xla_ops.compute_threshold_map's)."""
        if cfg.parity == "reference":
            # keep*g >= bound(t) == keep*g > bound(t)-1: bound >= 1
            # always (xla_ops.threshold_magnitude_bound), and suppressed
            # pixels hold kg == 0.
            lo_b = xla_ops.threshold_magnitude_bound(lo, cfg.grad_coeff, cfg.norm)
            hi_b = xla_ops.threshold_magnitude_bound(hi, cfg.grad_coeff, cfg.norm)
            return lo_b - 1, hi_b - 1
        # opencv parity: strict > against the (clamped, squared-for-l2)
        # raw-magnitude thresholds; kg > 0 implies keep.
        lo8 = jnp.clip(lo.astype(jnp.int32), 0, 2048)
        hi8 = jnp.clip(hi.astype(jnp.int32), 0, 2048)
        lo_c = lo8 * lo8 if cfg.norm == "l2" else lo8
        hi_c = hi8 * hi8 if cfg.norm == "l2" else hi8
        return lo_c, hi_c

    def thresh_map(lo, hi):
        lo_c, hi_c = cmp_bounds(lo, hi)
        return jnp.where(
            kg > hi_c,
            jnp.uint8(FINAL_EDGE),
            jnp.where(kg > lo_c, jnp.uint8(CANDIDATE_EDGE), jnp.uint8(NO_EDGE)),
        )

    lows = jnp.asarray(lows, jnp.int32)
    highs = jnp.asarray(highs, jnp.int32)
    k = lows.shape[0]
    h, w = kg.shape
    if sweep_ok(k, h, w) and k <= _SWEEP_UNROLL_MAX:
        # ONE kernel launch for all K tails (hysteresis_fused.sweep_fused):
        # kg stays resident in VMEM across the K grid steps, each step
        # classifies it against its pair's prefetch bounds, converges, and
        # emits its edge map — no per-pair launch/serialization overhead
        # (the residual the unrolled solo tails below still pay ~35 us
        # each for), no stacked-section round inflation, kg read from HBM
        # once. Measured at 1080p/K=16 (tools/sweep_probe.py): 2.75 ms
        # (lax.map u8 tails, r3) -> 2.28 (section stacking) -> 2.03
        # (unrolled solo tails) -> this form.
        bl, bh_ = zip(*(cmp_bounds(lows[i], highs[i]) for i in range(k)))
        bounds = jnp.stack([x for pair in zip(bl, bh_) for x in pair])
        # monotone_seed (r5): pairs are processed in descending-threshold
        # order and each warm-starts from its dominating predecessor's
        # converged plane (result_prev is a subset of result_next —
        # reachability is monotone in both bounds). Measured at 1080p
        # K=16: 1541 -> 1166 us (tools/sweep_seed_probe.py); converged
        # outputs bit-identical to cold starts (the fixed point is
        # unique; tested incl. shuffled/non-dominating pair lists).
        maps = sweep_fused(
            kg, bounds,
            max_iters=cfg.max_hysteresis_iters,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
            interpret=interpret,
            monotone_seed=True,
        )
    elif fused_ok(h, w) and k <= _SWEEP_UNROLL_MAX:
        # UNROLLED nmsq tails: K is static, so the K kernel invocations
        # are plain call sites in one compiled program — no lax.map
        # (whose per-iteration tax measured ~80 us at 1080p), no section
        # stacking, and no per-pair XLA compare pass: each tail is ONE
        # hysteresis_fused_nmsq launch that classifies kg against the
        # pair's prefetch-scalar bounds during its in-kernel pack (the
        # u8 threshold map never exists). All K tails share ONE kernel
        # shape, hence one Mosaic compile. Measured at 1080p/K=16
        # (tools/sweep_probe.py, r4): 2.75 ms (lax.map over u8-map
        # tails) -> 2.28 (section stacking — loses when section
        # convergence depths vary: the stack's rounds run to the
        # SLOWEST section at K-wide round cost) -> 2.03 (unrolled
        # u8-map tails) -> this form.
        def nmsq_tail(i):
            lo_c, hi_c = cmp_bounds(lows[i], highs[i])
            return hysteresis_fused_nmsq(
                kg, lo_c, hi_c,
                max_iters=cfg.max_hysteresis_iters,
                dilate_steps=cfg.hysteresis_inner_steps,
                scan_after=cfg.hysteresis_scan_after,
                interpret=interpret,
            )

        maps = jnp.stack([nmsq_tail(i) for i in range(k)])
    else:
        # Very large K (program-size guard) or frames past the fused
        # kernel's budget (8K): tails dispatch per pair via lax.map
        # through _hyster's usual size policy.
        def tail(pair):
            lo, hi = pair
            return _hyster(thresh_map(lo, hi), cfg, interpret)

        # lax.map, not vmap: the fused hysteresis kernel's manual DMA grid
        # doesn't vectorise (same reason the engine batches with lax.map).
        maps = jax.lax.map(tail, (lows, highs))
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
