"""Fused Pallas hysteresis: pack + convergence + scans + unpack, ONE kernel.

The bit-packed hysteresis (ops/bitpack.py) is exactly the right algorithm,
but run as XLA ops its 1080p frame spends ~24 us packing/unpacking through
HBM and ~109 us in a convergence loop whose every round re-materializes a
~300 KB state (tools/hyster_breakdown.py). This kernel runs the whole
operator on-chip:

* the (H, W) uint8 threshold map is DMA'd HBM->VMEM in 128-row chunks
  (double buffered) and packed in-VMEM into the row-major bit layout of
  ops/bitpack.py (32 image rows per uint32 word);
* BOTH phases — the dilation rounds and the escalation rounds with
  8-direction carry-lookahead scans — run as ``lax.while_loop``s whose
  state lives in a VMEM scratch ref: zero HBM traffic between rounds;
* the converged plane is unpacked in-VMEM and written out as the final
  uint8 edge map, one pipelined output block per grid step.

Round-schedule parity: both phases' round operators are built by the SAME
factory as every other backend (``bitpack._make_ops``) with this module's
roll-based shift primitives injected — step cadence, direction order,
doubling-step sequences, and round counting are shared code, so outputs
stay bit-identical across backends even when ``max_iters`` truncates (the
CLAUDE.md invariant; docs/parity.md).

Zero-fill shift semantics under ``pltpu.roll``'s wraparound come from a
guard ring: the packed planes carry one guard word-row (32 image rows) and
128 guard lanes that hold zero FOREVER — a promotion can only set bits
where CANDIDATE is set, and the guards have no candidates; inside a scan,
``pp`` (propagate) is zero in the guards so ``g`` never grows there
either. Hence any shift whose reach is within the guard ring wraps only
zeros into real pixels and needs no masking (every dilation, and most scan
steps); scan steps that reach PAST the ring (lane shifts > 128 px,
word shifts > 1 word-row) AND the wrapped region with an iota mask to
reproduce exact zero fill. The same guard-ring idea as the feed-forward
slab (feedforward.py).

The module grew a small kernel family around that core (all executing the
ONE factory schedule):

* :func:`hysteresis_fused` — u8 threshold map in, edge map out (above);
* :func:`hysteresis_fused_nmsq` — raw int32 ``keep*g`` magnitude plane in,
  classification against traced scalar bounds during the pack (no u8 map
  ever exists);
* :func:`sweep_fused` — ALL K threshold-sweep tails in one launch against
  a VMEM-resident magnitude plane (one grid step per pair; r5's
  ``monotone_seed`` warm-starts each pair from its dominating
  predecessor's converged plane);
* :func:`saturate_packed` — packed planes in/out, both phases, no
  pack/unpack: the sharded round loop's local operator
  (parallel/packed_halo.py);
* :func:`converge_packed_split` — column-sliced convergence with
  seam-halo rounds under a total-round budget: the compile-tractable
  escalation form for plane shapes whose monolithic scan kernel the
  Mosaic compiler cannot handle (the 8K continuation,
  megakernel._cont_split);
* :func:`hysteresis_fused_batched` — section-stacked multi-map variant
  (kept with its bit-exactness pins; the sweep no longer uses it — see
  its docstring for when stacking pays).

Reference analog being replaced: the host relaunch loop around the
hysteresis kernel, /root/reference/src/cvp/cannyEdgeH.cu:297-338, and the
per-block shared-memory iteration of cannyEdgeD.cu:295-377.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudacam_tpu.ops import bitpack
from cudacam_tpu.stages import CANDIDATE_EDGE, FINAL_EDGE

#: Guard lanes appended to the packed width so lane rolls wrap zeros.
_GUARD_LANES = 128

#: VMEM budget for the packed working set: ~6 plane-sized u32 arrays are
#: simultaneously live inside a scan round (f, p, g, pp + shifted
#: temporaries), plus chunk buffers and the pipelined output block.
_PLANE_BUDGET = 1_600_000


def _geometry(h: int, w: int) -> Tuple[int, int, int, int]:
    """(chunk_rows, n_chunks, hwp, wp) for a (h, w) frame."""
    # 128-row chunks: 256-row chunking put 4K past the 16 MB scoped-VMEM
    # limit by ~0.8 MB (chunk + output double buffers).
    ch = 128 if h > 128 else ((h + 31) // 32) * 32
    n_chunks = -(-h // ch)
    hwp = n_chunks * (ch // 32) + 1  # +1: zero guard word-row for roll wrap
    wp = w + _GUARD_LANES
    return ch, n_chunks, hwp, wp


def _pad_shape(h: int, w: int) -> Tuple[int, int]:
    """DMA-granule-padded frame shape (zero padding is exact: pad cells
    are NO_EDGE, which is absorbing — no candidates, no promotion)."""
    return max(32, ((h + 7) // 8) * 8), ((w + 127) // 128) * 128


def fused_ok(h: int, w: int) -> bool:
    """True when the fused kernel applies: a packed working set that fits
    VMEM after granule padding (~1080p..4K; 8K's 4.5 MB planes would put
    a round's live set past the limit — those sizes keep the XLA loop,
    whose mega-frame chunking already exists)."""
    hp, wp_frame = _pad_shape(h, w)
    _, _, hwp, wp = _geometry(hp, wp_frame)
    return hwp * wp * 4 <= _PLANE_BUDGET


def _make_pl_shifts(hwp: int, wp: int):
    """The three shift primitives ``bitpack._make_ops`` injects, as Pallas
    rolls over the guard-ringed (hwp, wp) planes. Masking policy per the
    module docstring: free within the guard ring, iota-masked past it."""

    def shift_words(x: jnp.ndarray, k: int) -> jnp.ndarray:
        # out[i, :] = x[i-k, :]; one guard word-row -> |k| <= 1 free.
        if k == 0:
            return x
        rolled = pltpu.roll(x, k % hwp, 0)
        if abs(k) <= 1:
            return rolled
        io = jax.lax.broadcasted_iota(jnp.int32, (hwp, 1), 0)
        keep = (io >= k) if k > 0 else (io < hwp + k)
        return rolled * keep.astype(jnp.uint32)

    def shift_cols(x: jnp.ndarray, k: int) -> jnp.ndarray:
        # out[:, c] = x[:, c-k]; 128 guard lanes -> |k| <= 128 free.
        if k == 0:
            return x
        rolled = pltpu.roll(x, k % wp, 1)
        if abs(k) <= _GUARD_LANES:
            return rolled
        io = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
        keep = (io >= k) if k > 0 else (io < wp + k)
        return rolled * keep.astype(jnp.uint32)

    def shift_px(x: jnp.ndarray, s: int) -> jnp.ndarray:
        # out[row r] = x[row r-s]: same q/r decomposition as
        # bitpack._shift_px, with shift_words above supplying zero fill.
        if s == 0:
            return x
        q, r = divmod(abs(s), 32)
        if s > 0:
            base = shift_words(x, q)
            if r == 0:
                return base
            return (base << jnp.uint32(r)) | (
                shift_words(base, 1) >> jnp.uint32(32 - r)
            )
        base = shift_words(x, -q)
        if r == 0:
            return base
        return (base >> jnp.uint32(r)) | (
            shift_words(base, -1) << jnp.uint32(32 - r)
        )

    def shift_px_inexact(x: jnp.ndarray, s: int) -> jnp.ndarray:
        # bitpack's cheap intermediate-step operator (no cross-word carry).
        return x << jnp.uint32(1) if s > 0 else x >> jnp.uint32(1)

    return shift_cols, shift_px, shift_px_inexact


def _kernel(
    *refs,
    h: int,
    w: int,
    ch: int,
    n_chunks: int,
    hwp: int,
    wp: int,
    dilate_steps: int,
    scan_after: int,
    max_iters: int,
    carry_every: int,
    log_h: int,
    log_w: int,
    nmsq: bool,
):
    # nmsq mode prepends a (2,) scalar-prefetch ref with the (lo, hi)
    # comparison bounds; the input is then the RAW int32 NMS-masked
    # magnitude plane (feedforward.feed_forward_nmsq) and the threshold
    # classification happens during the pack — no u8 threshold map ever
    # exists (the sweep's per-pair XLA compare pass and its HBM round
    # trip are gone).
    if nmsq:
        bounds_ref, thresh_hbm, out_ref, flags_ref, chunk, f_ref, p_ref, sems = refs
    else:
        thresh_hbm, out_ref, flags_ref, chunk, f_ref, p_ref, sems = refs
    i = pl.program_id(0)
    kw = ch // 32  # word-rows per chunk
    n_last = h - (n_chunks - 1) * ch  # rows in the last chunk (mult of 8)

    def dma(slot, k):
        n = n_last if k == n_chunks - 1 else ch
        return pltpu.make_async_copy(
            thresh_hbm.at[pl.ds(k * ch, n), :],  # k*ch static: unrolled loop
            chunk.at[slot, pl.ds(0, n), pl.ds(0, w)],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        # ---- pack: DMA chunks in, double buffered; pack both planes -----
        # Zero what the DMAs don't fill: guard lanes of both slots, the
        # last chunk's tail rows, the planes' guard word-row.
        cdt = jnp.int32 if nmsq else jnp.uint8
        chunk[0, :, w:] = jnp.zeros((ch, wp - w), cdt)
        chunk[1 % min(2, n_chunks), :, w:] = jnp.zeros((ch, wp - w), cdt)
        f_ref[hwp - 1 :, :] = jnp.zeros((1, wp), jnp.uint32)
        p_ref[hwp - 1 :, :] = jnp.zeros((1, wp), jnp.uint32)

        dma(0, 0).start()
        io = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
        for k in range(n_chunks):
            if k + 1 < n_chunks:
                dma((k + 1) % 2, k + 1).start()
            dma(k % 2, k).wait()
            if k == n_chunks - 1 and n_last < ch:
                chunk[k % 2, n_last:, :] = jnp.zeros(
                    (ch - n_last, wp), cdt
                )
            # Upcast before comparing: Mosaic has no packed-i8 vector
            # compare on this target, same reason the FF slab upcasts.
            t = chunk[k % 2].astype(jnp.int32)
            # int32 modular adds of distinct powers of two == the u32 OR
            # (Mosaic: u32 reductions unimplemented; verified in
            # tools/hyster_kernel_probe.py).
            if nmsq:
                # Strict > against the prefetch bounds; the CANDIDATE
                # plane must EXCLUDE finals exactly as bitpack.pack_pair
                # does (scan carries regenerate at finals rather than
                # propagating through them — a bit-exactness contract,
                # not just a fixed-point one).
                fb = (t > bounds_ref[1]).astype(jnp.int32)
                pb = (t > bounds_ref[0]).astype(jnp.int32) * (1 - fb)
            else:
                fb = (t == FINAL_EDGE).astype(jnp.int32)
                pb = (t == CANDIDATE_EDGE).astype(jnp.int32)
            f_ref[k * kw : (k + 1) * kw, :] = jnp.sum(
                fb.reshape(kw, 32, wp) << io, axis=1, dtype=jnp.int32
            ).astype(jnp.uint32)
            p_ref[k * kw : (k + 1) * kw, :] = jnp.sum(
                pb.reshape(kw, 32, wp) << io, axis=1, dtype=jnp.int32
            ).astype(jnp.uint32)

        # ---- both convergence phases: bitpack's schedule on VMEM state --
        # Schedule extents are the LOGICAL frame dims: the scans'
        # doubling-step sequences must match bitpack's on the unpadded
        # frame exactly, or round counts (and cap-truncated outputs)
        # would diverge across backends when the caller granule-padded.
        dilates, scans = bitpack._make_ops(
            log_h, log_w, dilate_steps, carry_every=carry_every,
            shifts=_make_pl_shifts(hwp, wp),
        )
        p = p_ref[:, :]

        def rounder(op):
            def round_once(carry):
                it, _ = carry
                f = f_ref[:, :]
                nf = op(f, p)
                f_ref[:, :] = nf
                return it + 1, jnp.max((nf != f).astype(jnp.int32))

            return round_once

        round1 = rounder(dilates)
        round2 = rounder(lambda f, p: scans(dilates(f, p), p))

        # Phase 1: first round unconditionally (the reference always
        # launches once before reading its flag, cannyEdgeH.cu:313), then
        # dilation rounds while the state grows, up to min(scan_after,
        # max_iters). Phase 2: escalated rounds (dilations + 8-direction
        # scans) up to max_iters. Identical loop structure and counting to
        # bitpack.hysteresis_packed's two while_loops (growth == change:
        # promotion is monotone).
        cap1 = min(scan_after, max_iters)
        it, changed = round1((jnp.int32(0), jnp.int32(0)))
        it, changed = jax.lax.while_loop(
            lambda c: (c[1] == 1) & (c[0] < cap1), round1, (it, changed)
        )
        it, changed = jax.lax.while_loop(
            lambda c: (c[1] == 1) & (c[0] < max_iters), round2, (it, changed)
        )
        flags_ref[0, 0] = it
        flags_ref[0, 1] = changed

    # ---- unpack this grid step's block from the resident state ----------
    io32 = jax.lax.broadcasted_iota(jnp.uint32, (32, 1), 0)
    for k in range(kw):
        word = f_ref[pl.ds(i * kw + k, 1), pl.ds(0, w)]
        bits = (jnp.broadcast_to(word, (32, w)) >> io32) & jnp.uint32(1)
        out_ref[k * 32 : (k + 1) * 32, :] = (
            bits * jnp.uint32(FINAL_EDGE)
        ).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iters", "dilate_steps", "scan_after", "carry_every", "interpret",
        "log_h", "log_w",
    ),
)
def _fused_call(
    thresh: jnp.ndarray,
    max_iters: int,
    dilate_steps: int,
    scan_after: int,
    carry_every: int,
    interpret: bool,
    log_h: int,
    log_w: int,
    bounds=None,
):
    h, w = thresh.shape
    nmsq = bounds is not None
    ch, n_chunks, hwp, wp = _geometry(h, w)
    kern = functools.partial(
        _kernel,
        h=h, w=w, ch=ch, n_chunks=n_chunks, hwp=hwp, wp=wp,
        dilate_steps=dilate_steps, scan_after=scan_after,
        max_iters=max_iters, carry_every=carry_every,
        log_h=log_h, log_w=log_w, nmsq=nmsq,
    )
    out_specs = [
        pl.BlockSpec(
            (ch, w),
            (lambda i, b: (i, 0)) if nmsq else (lambda i: (i, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_chunks * ch, w), jnp.uint8),
        jax.ShapeDtypeStruct((1, 2), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((2, ch, wp), jnp.int32 if nmsq else jnp.uint8),
        pltpu.VMEM((hwp, wp), jnp.uint32),
        pltpu.VMEM((hwp, wp), jnp.uint32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        # The scan rounds hold ~8 plane-sized temporaries live; at 4K
        # that puts the conservative scoped accounting past the 16 MB
        # default. v5e VMEM is physically larger — raise the cap (the
        # 1080p program stays under the default either way).
        vmem_limit_bytes=64 * 1024 * 1024,
    )
    if nmsq:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # (lo, hi) comparison bounds
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        out, flags = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(jnp.asarray(bounds, jnp.int32).reshape(2), thresh)
    else:
        out, flags = pl.pallas_call(
            kern,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(thresh)
    return out[:h] if n_chunks * ch != h else out, flags


def hysteresis_fused(
    thresh: jnp.ndarray,
    max_iters: int = 100,
    remove_candidates: bool = True,
    return_iters: bool = False,
    dilate_steps: int = 16,
    scan_after: int = 10,
    interpret: bool = False,
    log_shape: Tuple[int, int] | None = None,
):
    """Drop-in for ``bitpack.hysteresis_packed`` on the Pallas backend:
    same arguments, bit-identical output (including under cap truncation —
    shared round schedule with logical-extent step sequences), at a
    fraction of the device time (1080p scene: 109 -> ~70 us).

    Any frame shape within :func:`fused_ok`'s VMEM budget works:
    off-granule shapes are zero-padded to the DMA granules (exact — pad
    cells are absorbing NO_EDGE) and sliced back.
    ``remove_candidates=False`` (candidates survive in the output) is one
    elementwise blend after the kernel. (The sharded round loop no longer
    routes through this u8-domain entry point — it carries packed planes
    and uses :func:`saturate_packed` instead.)

    ``log_shape`` overrides the schedule extents fed to
    ``bitpack._make_ops`` (default: the input's own shape). The batched
    section-stacked caller (:func:`hysteresis_fused_batched`) passes the
    PER-SECTION extent so the stacked run executes exactly the solo
    frame's round schedule — extents are a schedule-parity input, never a
    masking input (masking derives from the real plane geometry)."""
    h, w = thresh.shape
    log_h, log_w = log_shape if log_shape is not None else (h, w)
    hp, wp = _pad_shape(h, w)
    t_in = (
        thresh if (hp, wp) == (h, w)
        else jnp.pad(thresh, ((0, hp - h), (0, wp - w)))
    )
    out, flags = _fused_call(
        t_in, max_iters, dilate_steps, scan_after,
        bitpack._CARRY_EVERY, interpret, log_h, log_w,
    )
    if (hp, wp) != (h, w):
        out = out[:h, :w]
    if not remove_candidates:
        out = jnp.where(out == np.uint8(FINAL_EDGE), out, thresh)
    if return_iters:
        return out, flags[0, 0]
    return out


def hysteresis_fused_nmsq(
    kg: jnp.ndarray,
    lo_cmp: jnp.ndarray,
    hi_cmp: jnp.ndarray,
    max_iters: int = 100,
    dilate_steps: int = 16,
    scan_after: int = 10,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused threshold + hysteresis straight from the RAW int32 NMS-masked
    magnitude plane (``feedforward.feed_forward_nmsq``'s ``keep * g``):
    the per-pair classification is a strict-``>`` compare against the
    TRACED scalar bounds during the in-kernel pack, so no u8 threshold
    map ever exists — this is the threshold sweep's tail
    (ops/pallas/canny.threshold_sweep_pallas): K pairs reuse ONE kernel
    shape with different prefetch scalars (zero recompiles), each tail
    one launch, no per-pair XLA compare pass and no 2 MB u8 round trip.

    ``lo_cmp``/``hi_cmp`` are the comparable-domain bounds (already
    squared for L2 / already the bound-1 form in reference parity —
    ops/pallas/canny.py derives them per parity domain); FINAL is
    ``kg > hi_cmp``, CANDIDATE is ``lo_cmp < kg <= hi_cmp`` — exactly
    ``pack_pair``'s planes for the equivalent u8 map, so the output is
    bit-identical to ``hysteresis_fused(thresh_map)`` including under
    cap truncation (the shared-schedule contract). Zero padding is exact:
    pad cells hold kg == 0 and the bounds are clamped non-negative."""
    h, w = kg.shape
    hp, wp = _pad_shape(h, w)
    k_in = (
        kg if (hp, wp) == (h, w)
        else jnp.pad(kg, ((0, hp - h), (0, wp - w)))
    )
    bounds = jnp.stack([
        jnp.maximum(jnp.asarray(lo_cmp, jnp.int32), np.int32(0)),
        jnp.maximum(jnp.asarray(hi_cmp, jnp.int32), np.int32(0)),
    ])
    out, _ = _fused_call(
        k_in, max_iters, dilate_steps, scan_after,
        bitpack._CARRY_EVERY, interpret, h, w, bounds,
    )
    return out[:h, :w] if (hp, wp) != (h, w) else out


def _sweep_kernel(
    bounds_ref,
    kg_hbm,
    out_ref,
    kg_ref,
    f_ref,
    p_ref,
    sems,
    *,
    h: int,
    w: int,
    hp: int,
    ch: int,
    n_chunks: int,
    hwp: int,
    wp: int,
    dilate_steps: int,
    scan_after: int,
    max_iters: int,
    carry_every: int,
    carry_seed: bool = False,
):
    i = pl.program_id(0)  # one grid step per (low, high) pair
    kw = ch // 32

    @pl.when(i == 0)
    def _():
        # kg becomes RESIDENT: one DMA for the whole sweep. The scratch
        # is padded to whole chunks; zero the guard lanes and tail rows
        # the DMA leaves unfilled (kg == 0 is below every bound).
        cp = pltpu.make_async_copy(
            kg_hbm,
            kg_ref.at[pl.ds(0, hp), pl.ds(0, kg_hbm.shape[1])],
            sems.at[0],
        )
        cp.start()
        cp.wait()
        if kg_hbm.shape[1] < wp:
            kg_ref[:, kg_hbm.shape[1] :] = jnp.zeros(
                (kg_ref.shape[0], wp - kg_hbm.shape[1]), jnp.int32
            )
        if kg_ref.shape[0] > hp:
            kg_ref[hp:, :] = jnp.zeros(
                (kg_ref.shape[0] - hp, wp), jnp.int32
            )

    # ---- classify + pack this pair's planes from the RESIDENT kg -------
    f_ref[hwp - 1 :, :] = jnp.zeros((1, wp), jnp.uint32)
    p_ref[hwp - 1 :, :] = jnp.zeros((1, wp), jnp.uint32)
    lo_c = bounds_ref[2 * i]
    hi_c = bounds_ref[2 * i + 1]
    if carry_seed:
        # Monotone warm start (VERDICT r4 #4): when the PREVIOUS grid
        # step's pair dominates this one (lo_prev >= lo, hi_prev >= hi),
        # its converged result is a subset of this pair's fixed point
        # (fewer finals, fewer candidates, reachability monotone in
        # both), so its plane — still resident in f_ref from step i-1 —
        # is a valid under-approximation to seed from: OR it over this
        # pair's own seeds and converge from there. Round savings ~ the
        # delta between consecutive results instead of the full depth.
        # The check is per-step against the prefetch bounds, so unsorted
        # pair lists degrade to cold starts, never to wrong bits. A
        # seeded state is indistinguishable from a mid-convergence state
        # (f grows into candidate positions while p stays static), so
        # the round operators need no changes; CONVERGED outputs are
        # bit-identical to cold starts (the fixed point is unique), only
        # cap-TRUNCATED outputs may differ (they converge from further
        # along — same carve-out class as the sharded loop,
        # docs/parity.md).
        # Clamp the predecessor indices: at i == 0 the (i > 0) mask
        # discards the comparison, but jnp.where still evaluates both
        # operands and a raw [2*i-2] would be an out-of-contract
        # negative SMEM read (a review catch — benign today, undefined
        # under future Mosaic bounds checking).
        prev = jnp.maximum(2 * i - 2, 0)
        seed_keep = jnp.where(
            (i > 0)
            & (bounds_ref[prev] >= lo_c)
            & (bounds_ref[prev + 1] >= hi_c),
            jnp.uint32(0xFFFFFFFF),
            jnp.uint32(0),
        )
    io = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
    for k in range(n_chunks):
        t = kg_ref[k * ch : (k + 1) * ch, :]
        fb = (t > hi_c).astype(jnp.int32)
        pb = (t > lo_c).astype(jnp.int32) * (1 - fb)
        fw = jnp.sum(
            fb.reshape(kw, 32, wp) << io, axis=1, dtype=jnp.int32
        ).astype(jnp.uint32)
        if carry_seed:
            # Read-then-write per chunk: the slice still holds step
            # i-1's converged words here (garbage at i == 0, masked off).
            fw = fw | (f_ref[k * kw : (k + 1) * kw, :] & seed_keep)
        f_ref[k * kw : (k + 1) * kw, :] = fw
        p_ref[k * kw : (k + 1) * kw, :] = jnp.sum(
            pb.reshape(kw, 32, wp) << io, axis=1, dtype=jnp.int32
        ).astype(jnp.uint32)

    # ---- both convergence phases (the shared factory schedule) ---------
    dilates, scans = bitpack._make_ops(
        h, w, dilate_steps, carry_every=carry_every,
        shifts=_make_pl_shifts(hwp, wp),
    )
    p = p_ref[:, :]

    def rounder(op):
        def round_once(carry):
            it, _ = carry
            f = f_ref[:, :]
            nf = op(f, p)
            f_ref[:, :] = nf
            return it + 1, jnp.max((nf != f).astype(jnp.int32))

        return round_once

    round1 = rounder(dilates)
    round2 = rounder(lambda f, p: scans(dilates(f, p), p))
    cap1 = min(scan_after, max_iters)
    it, changed = round1((jnp.int32(0), jnp.int32(0)))
    it, changed = jax.lax.while_loop(
        lambda c: (c[1] == 1) & (c[0] < cap1), round1, (it, changed)
    )
    jax.lax.while_loop(
        lambda c: (c[1] == 1) & (c[0] < max_iters), round2, (it, changed)
    )

    # ---- unpack into this step's pipelined output block ----------------
    # (Edge COUNTS deliberately stay an external XLA pass: both in-kernel
    # forms probed WORSE on this hardware — accumulating i32 sums from
    # the unpacked bits +85 us, popcount+reduce on the packed plane
    # +19 us, vs the 53 us XLA pass over the K maps. Mosaic's
    # full-plane-to-scalar reductions dominate; see docs/performance.md.)
    io32 = jax.lax.broadcasted_iota(jnp.uint32, (32, 1), 0)
    for k in range(hwp - 1):
        word = f_ref[pl.ds(k, 1), pl.ds(0, w)]
        bits = (jnp.broadcast_to(word, (32, w)) >> io32) & jnp.uint32(1)
        out_ref[0, k * 32 : (k + 1) * 32, :] = (
            bits * jnp.uint32(FINAL_EDGE)
        ).astype(jnp.uint8)


def sweep_ok(k: int, h: int, w: int) -> bool:
    """True when the K-pair resident-kg sweep kernel fits VMEM: the kg
    plane (int32) + two packed planes + the output block, with phase-2
    scan temporaries — 1080p (~13 MB) and 4K (~48 MB) qualify under the
    raised 64 MB cap; 8K's 136 MB kg plane does not."""
    hp, wpad = _pad_shape(h, w)
    _, _, hwp, wp = _geometry(hp, wpad)
    kg_bytes = hp * wp * 4
    plane = hwp * wp * 4
    out_block = -(-hp // 32) * 32 * w
    return (
        k >= 1
        and plane <= _PLANE_BUDGET
        and kg_bytes + 8 * plane + out_block <= 52 * 1024 * 1024
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iters", "dilate_steps", "scan_after", "carry_every", "interpret",
        "monotone_seed",
    ),
)
def sweep_fused(
    kg: jnp.ndarray,
    bounds: jnp.ndarray,
    max_iters: int = 100,
    dilate_steps: int = 16,
    scan_after: int = 10,
    carry_every: int = bitpack._CARRY_EVERY,
    interpret: bool = False,
    monotone_seed: bool = False,
) -> jnp.ndarray:
    """ALL K threshold-sweep tails in ONE kernel launch: the int32
    NMS-masked magnitude plane (``feed_forward_nmsq``) is DMA'd into VMEM
    once and stays RESIDENT; each grid step classifies it against one
    (lo, hi) prefetch bound pair, converges that pair's packed planes
    through both factory-schedule phases, and emits its edge map as a
    pipelined output block. Per-pair cost is sum(rounds_i) on solo-sized
    planes (no stacked-section round inflation) with kg read from HBM
    once and ZERO per-pair launch/serialization overhead — the residual
    the unrolled solo tails still paid ~35 us each for
    (tools/sweep_probe.py, r4). ``bounds`` is (2K,) int32
    [lo_0, hi_0, lo_1, hi_1, ...] in the comparable domain
    (hysteresis_fused_nmsq's contract). Returns (K, H, W) uint8 edge
    maps, each bit-identical to the solo fused/XLA tail (shared
    schedule). The reference's analog is K full kernel-chain relaunches
    (cannyEdgeH.cu:49-120).

    ``monotone_seed=True`` additionally exploits threshold-sweep
    monotonicity: pairs are processed in lexicographically DESCENDING
    (lo, hi) order (a traced sort — the pair values stay runtime data),
    each step warm-starts from the previous step's converged plane
    whenever that pair dominates it (checked per step in-kernel; see
    _sweep_kernel), and each edge map is emitted directly to its
    ORIGINAL index via a prefetch-indexed output block map — the
    returned order is unchanged and no post-hoc gather exists. Converged
    outputs are bit-identical to the unseeded form; only cap-TRUNCATED
    outputs may differ (docs/parity.md carve-out)."""
    h, w = kg.shape
    k = bounds.shape[0] // 2
    hp, wpad = _pad_shape(h, w)
    kg_in = (
        kg if (hp, wpad) == (h, w)
        else jnp.pad(kg, ((0, hp - h), (0, wpad - w)))
    )
    ch, n_chunks, hwp, wp = _geometry(hp, wpad)
    out_rows = (hwp - 1) * 32
    kern = functools.partial(
        _sweep_kernel,
        h=h, w=w, hp=hp, ch=ch, n_chunks=n_chunks, hwp=hwp, wp=wp,
        dilate_steps=dilate_steps, scan_after=scan_after,
        max_iters=max_iters, carry_every=carry_every,
        carry_seed=monotone_seed,
    )
    pre = jnp.maximum(jnp.asarray(bounds, jnp.int32), np.int32(0))
    if monotone_seed:
        pairs = pre.reshape(k, 2)
        perm = jnp.lexsort((-pairs[:, 1], -pairs[:, 0]))  # desc (lo, hi)
        pre = jnp.concatenate(
            [pairs[perm].reshape(-1), perm.astype(jnp.int32)]
        )
        out_map = lambda i, b: (b[2 * k + i], 0, 0)
    else:
        out_map = lambda i, b: (i, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # (2K,) bounds [+ (K,) output positions]
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (1, out_rows, w), out_map,
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_chunks * ch, wp), jnp.int32),
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    # 4K-class working sets sit within ~1 MB of the 64 MB cap and the
    # seeded form's extra pack temporaries push past it (measured OOM by
    # 1.32 MB); v5e physical VMEM is 128 MB — raise the cap before
    # shrinking a working set (CLAUDE.md).
    est = hp * wp * 4 + 8 * hwp * wp * 4 + out_rows * w
    vmem_cap = (100 if est > 45 * 1024 * 1024 else 64) * 1024 * 1024
    (out,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((k, out_rows, w), jnp.uint8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_cap,
        ),
        interpret=interpret,
    )(pre, kg_in)
    return out[:, :h, :]


def _sat_kernel(
    f_hbm,
    p_hbm,
    fout_hbm,
    flags_ref,
    f_ref,
    p_ref,
    sems,
    *,
    log_h: int,
    log_w: int,
    hwp: int,
    wp: int,
    dilate_steps: int,
    scan_after: int,
    max_iters: int,
    carry_every: int,
):
    cp_f = pltpu.make_async_copy(f_hbm, f_ref, sems.at[0])
    cp_p = pltpu.make_async_copy(p_hbm, p_ref, sems.at[1])
    cp_f.start()
    cp_p.start()
    cp_f.wait()
    cp_p.wait()

    dilates, scans = bitpack._make_ops(
        log_h, log_w, dilate_steps, carry_every=carry_every,
        shifts=_make_pl_shifts(hwp, wp),
    )
    p = p_ref[:, :]

    def rounder(op):
        def round_once(carry):
            it, _ = carry
            f = f_ref[:, :]
            nf = op(f, p)
            f_ref[:, :] = nf
            return it + 1, jnp.max((nf != f).astype(jnp.int32))

        return round_once

    round1 = rounder(dilates)
    round2 = rounder(lambda f, p: scans(dilates(f, p), p))

    # bitpack.converge_packed's two phases, identically counted: one
    # unconditional phase-1 round, dilation rounds to min(scan_after,
    # max_iters), escalated rounds to max_iters.
    cap1 = min(scan_after, max_iters)
    it, changed = round1((jnp.int32(0), jnp.int32(0)))
    it, changed = jax.lax.while_loop(
        lambda c: (c[1] == 1) & (c[0] < cap1), round1, (it, changed)
    )
    it, changed = jax.lax.while_loop(
        lambda c: (c[1] == 1) & (c[0] < max_iters), round2, (it, changed)
    )
    flags_ref[0, 0] = it
    flags_ref[0, 1] = changed

    cp_out = pltpu.make_async_copy(f_ref, fout_hbm, sems.at[0])
    cp_out.start()
    cp_out.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "log_h", "log_w", "dilate_steps", "scan_after", "max_iters",
        "carry_every", "interpret", "return_iters",
    ),
)
def saturate_packed(
    f: jnp.ndarray,
    p: jnp.ndarray,
    log_h: int,
    log_w: int,
    dilate_steps: int = 16,
    scan_after: int = 10,
    max_iters: int = 100,
    carry_every: int = bitpack._CARRY_EVERY,
    interpret: bool = False,
    return_iters: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Local saturation directly on pre-packed guard-ringed planes —
    the Pallas form of ``bitpack.converge_packed`` (same two phases, same
    factory schedule), used as the sharded round loop's local operator
    (parallel/packed_halo.packed_hysteresis_loop): the planes stay the
    carried loop state across collective rounds, so no per-round
    pack/unpack and no u8 tile round trips. Returns
    ``(f_converged, growing)``; ``growing`` is True iff the cap truncated
    before the local fixed point.

    Layout contract (packed_halo module docstring): (hwp, wp) u32 planes
    whose rows/lanes past the extended tile are permanent zeros — the
    guard ring this kernel's roll shifts wrap into. ``log_h``/``log_w``
    are the schedule extents (the extended tile's pixel dims)."""
    hwp, wp = f.shape
    kern = functools.partial(
        _sat_kernel,
        log_h=log_h, log_w=log_w, hwp=hwp, wp=wp,
        dilate_steps=dilate_steps, scan_after=scan_after,
        max_iters=max_iters, carry_every=carry_every,
    )
    fout, flags = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hwp, wp), jnp.uint32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
            has_side_effects=True,  # the output leaves via manual DMA
        ),
        interpret=interpret,
    )(f, p)
    if return_iters:
        return fout, flags[0, 1] == 1, flags[0, 0]
    return fout, flags[0, 1] == 1


def converge_packed_split(
    f: jnp.ndarray,
    p: jnp.ndarray,
    log_h: int,
    log_w: int,
    n_split: int,
    dilate_steps: int = 16,
    scan_after: int = 10,
    max_iters: int = 100,
    chunk: Optional[int] = None,
    it0=0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Converge guard-ringed packed planes by COLUMN slices with seam-halo
    rounds — the compile-tractable escalation form for plane shapes whose
    monolithic 8-direction scan kernel the Mosaic compiler cannot handle
    (the 8K class: a 25-minute compile timeout, probed r3/r4 and
    unchanged; docs/performance.md). Each round runs
    :func:`saturate_packed` on every (hwp, 64+log_w/n_split+64+128)
    slice — a 4K-class shape that compiles — then the owned columns are
    written back, so the next round's slice extraction carries 64 lanes
    of fresh neighbor state across each seam (the same halo-slot scheme
    as the multi-chip packed exchange, parallel/packed_halo.py, with
    plain slicing standing in for the wire). Terminates when a round
    changes nothing, bounded by ``max_iters`` seam rounds.

    Returns ``(f_converged, growing)``; ``growing`` True iff the loop
    truncated while still changing. This is a MULTI-TILE executor:
    converged outputs equal every other backend's (unique fixed point,
    asserted in tests); cap-truncated outputs are a valid monotone
    under-approximation but not bit-matched to the single-chip
    truncation (the docs/parity.md carve-out).

    ``chunk`` bounds each slice launch's INTERNAL rounds. Without it, a
    cap-class input re-converges every slice to the full internal cap
    each seam round (up to max_iters^2 schedule rounds — probed at 8K:
    190 ms vs the XLA continuation's 35, tools/split8k_probe.py).
    Chunked, the loop carries a TOTAL round budget: each seam round
    consumes max-over-slices internal rounds (slices run the same
    global round window in parallel) starting from ``it0`` (a resumed
    continuation's phase-1 count), and stops at ``max_iters`` total —
    the single-chip executors' round-budget class, at in-kernel round
    cost (~50x cheaper than the XLA continuation's HBM rounds)."""
    hwp, wp = f.shape
    if log_w % n_split:
        raise ValueError(f"log_w {log_w} not divisible by n_split {n_split}")
    ws = log_w // n_split
    k = min(64, ws)

    def extract(x, i):
        lo, hi = i * ws - k, (i + 1) * ws + k
        left_pad = max(0, -lo)
        right_pad = hi - min(hi, log_w)
        sl = x[:, max(0, lo) : min(hi, log_w)]
        return jnp.pad(sl, ((0, 0), (left_pad, right_pad + _GUARD_LANES)))

    p_slices = [extract(p, i) for i in range(n_split)]
    inner_cap = chunk if chunk is not None else max_iters

    def body(state):
        f, _, it = state
        owned = []
        spent = jnp.int32(0)
        for i in range(n_split):
            sf, _, si = saturate_packed(
                extract(f, i), p_slices[i], log_h, k + ws + k,
                dilate_steps=dilate_steps, scan_after=scan_after,
                max_iters=inner_cap, interpret=interpret,
                return_iters=True,
            )
            spent = jnp.maximum(spent, si)
            owned.append(sf[:, k : k + ws])
        nf = jnp.concatenate(owned + [f[:, log_w:]], axis=1)
        # Round accounting: slices execute the same global round window
        # in parallel, so a seam round consumes max-over-slices internal
        # rounds (chunked mode) or one seam round (unchunked mode).
        return nf, jnp.any(nf != f), it + (spent if chunk else 1)

    f, changed, it = jax.lax.while_loop(
        # Loop while the PLANE (union of owned columns) still changes: a
        # round that changes nothing is a fixed point of this executor —
        # any promotion a slice makes ONLY in its (discarded) halo
        # columns is re-derived as an owned-column promotion by the
        # neighbor from the same round-start state, so no owned change
        # anywhere means no enabled promotion exists.
        lambda st: st[1] & (st[2] < max_iters),
        body,
        (f, jnp.bool_(True), jnp.asarray(it0, jnp.int32)),
    )
    # changed==True can only survive the loop via the round budget, so
    # it IS the truncated-before-fixed-point flag.
    return f, changed


def _section_stride(h: int) -> int:
    """Row stride of one section in a stacked batch: the section's rows
    rounded up to a whole packed word (32 image rows) plus one full zero
    word-row of spacer."""
    return ((h + 31) // 32) * 32 + 32


def batched_ok(g: int, h: int, w: int) -> bool:
    """True when a g-section stack of (h, w) maps fits the kernel's
    packed-plane VMEM budget."""
    return g >= 1 and fused_ok(g * _section_stride(h), w)


def hysteresis_fused_batched(
    threshs: jnp.ndarray,
    max_iters: int = 100,
    dilate_steps: int = 16,
    scan_after: int = 10,
    interpret: bool = False,
) -> jnp.ndarray:
    """Converge g independent threshold maps in ONE kernel launch.

    The (g, h, w) maps are stacked vertically at a 32-row-aligned stride
    with >=32 zero spacer rows between sections and run through the same
    fused kernel with ``log_shape`` pinned to the per-section (h, w), so
    every section's output is bit-identical to a solo run — including
    under cap truncation:

    * dilation promotion is masked by CANDIDATE, which is zero in every
      spacer row, so +-1 steps cannot cross a section boundary;
    * scan promotion uses the accumulated block propagate, which is zero
      across any span containing a spacer row, so carry-lookahead steps
      (shifts up to the section extent) cannot cross either;
    * rounds run until the SLOWEST section converges; a converged section
      sits at its absorbing fixed point through the extra rounds, and the
      phase-1/phase-2 boundary and the iteration cap land at the same
      global round indices as a solo run — identical cadence, identical
      bits (the docs/parity.md contract).

    This amortizes the per-launch costs a solo tail pays (kernel entry,
    pack/unpack ramp, output drain). When it pays: many sections of
    SIMILAR convergence depth. When it doesn't: varied depths — the
    stack's rounds run until the slowest section converges at
    g-section-wide round cost (~ g x max(rounds_i)) while solo launches
    pay only sum(rounds_i), which is why the r4 threshold sweep unrolls
    SOLO tails instead (measured at 1080p/K=16: unrolled 1.48 ms vs
    2.28 stacked vs 2.75 lax.map — ops/pallas/canny.py,
    tools/sweep_probe.py). The reference's only analog is K full
    relaunch loops (/root/reference/src/cvp/cannyEdgeH.cu:297-338)."""
    g, h, w = threshs.shape
    stride = _section_stride(h)
    tall = jnp.pad(threshs, ((0, 0), (0, stride - h), (0, 0))).reshape(
        g * stride, w
    )
    out = hysteresis_fused(
        tall,
        max_iters=max_iters,
        dilate_steps=dilate_steps,
        scan_after=scan_after,
        interpret=interpret,
        log_shape=(h, w),
    )
    return out.reshape(g, stride, w)[:, :h, :]
