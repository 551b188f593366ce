"""Bit-packed hysteresis: 32 pixels per lane, log-step run propagation.

The reference's hysteresis promotes candidates (128) 8-adjacent to a FINAL
edge (255) until a global fixed point, via per-block shared-memory iteration
plus a host relaunch loop (cannyEdgeD.cu:295-377; cannyEdgeH.cu:297-338).
Any dilate-by-one formulation — the reference's, and this framework's XLA
while-loop and Pallas sweep kernels — pays one full-frame vector pass per
pixel step of propagation, which measures ~1 ms/frame at 1080p on real
scenes (see docs/performance.md): the edge chains are hundreds of pixels
long, so hundreds of passes run.

This module is the TPU-native answer, and the framework's default
hysteresis on every backend:

* **Bit packing.** The FINAL and CANDIDATE masks are packed 32 pixels per
  uint32 lane ((H, ceil(W/32)) words). Every VPU op then processes 32x the
  pixels, and a full 1080p state is ~260 KB — the whole convergence loop
  lives in VMEM with no HBM round trips between steps.
* **Carry-lookahead run propagation.** Promotion along a scan direction is
  exactly the carry recurrence of an adder: carry_i = g_i | (p_i & carry_-),
  with g = FINAL and p = CANDIDATE. Each of the 8 directions is resolved by
  a Hillis-Steele doubling scan over (g, p) transfer pairs — log2(extent)
  shifted OR/AND steps promote an entire candidate run in ONE scan, instead
  of one pixel per dilation. A "round" chains all 8 directional scans, so
  each round extends edges through every monotone segment of a chain;
  convergence needs one round per direction *change* in the longest chain
  (plus one to observe no growth), not one pass per pixel.

Promotion is monotone toward the unique global fixed point (the same one
the oracle's BFS computes, numpy_oracle.hysteresis), so scan order affects
only speed, never the result. ``max_iters`` caps rounds (the analog of the
reference's 100-relaunch safety belt, cannyEdgeH.cu:313); because every
backend calls this same function, outputs are bit-identical across
backends even when the cap truncates (docs/parity.md).

Everything here is plain jax.numpy on integer types: it runs unchanged on
CPU (tests), under vmap (batched cameras), and inside shard_map (the
sharded engine's local step).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu.stages import CANDIDATE_EDGE, FINAL_EDGE, NO_EDGE

# NOTE: only numpy scalars appear in this module (never jnp.uint32(1) at
# module level): a module-level jax scalar is a concrete device array that
# gets embedded in every trace as a closure constant, and jax 0.9 hoists it
# into an executable *parameter* inconsistently across otherwise-identical
# traces (the "supplied 3 buffers but compiled program expected 4" dispatch
# failures). A numpy scalar always inlines as a literal.


def _bit_iota() -> jnp.ndarray:
    """(1, 1, 32) uint32 lane indices, as a traced iota rather than an
    embedded jnp.arange constant (closure constants can be hoisted into
    executable parameters, which breaks executable sharing across traces)."""
    return jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)


#: Cap on the uint32 scratch a single pack/unpack pass may expand to
#: (bytes) before the pass runs row-chunked. Within this size XLA keeps the
#: expansion on-chip (the whole 1080p frame, 8.3 MB, compiles with an
#: S(1)/VMEM placement and the pass runs at ~480 GB/s); far past it the
#: expansion falls off-chip and every packed word costs an extra 32-byte
#: HBM round trip (measured 8K: 872 us unchunked vs 456 chunked).
_PACK_ONCHIP_BYTES = 16_500_000

#: Target uint32-expansion size per chunk once a pass IS chunked. Swept on
#: hardware at 8K (tools/pack_probe.py): ~8 MB beats both smaller (more
#: lax.map iteration overhead) and larger (expansion spills) chunks.
_PACK_CHUNK_TARGET = 8_000_000


def _chunk_count(row_bytes: int) -> int:
    """Rows per chunk: the largest power of two whose expansion fits the
    chunk target (measured: power-of-two row counts are distinctly faster
    than same-size non-powers — 8K pack 308 us at 128 rows vs 495 at 160,
    424 at 192; unpack 289 at 256 vs 378 at 160)."""
    rows = max(8, _PACK_CHUNK_TARGET // row_bytes)
    return 1 << (rows.bit_length() - 1)


def _chunk_rows(fn, x: jnp.ndarray, h: int, row_bytes: int) -> jnp.ndarray:
    """Apply ``fn`` (rows-of-x -> rows-of-result) over row chunks sized so
    each chunk's uint32 expansion stays on-chip; single call when the whole
    array fits. Chunking is a ``lax.map`` over an (nb, rows, ...) reshape —
    rows are independent in both pack directions, so zero-padding ``h`` up
    to the chunk grid and slicing the result back is exact."""
    if h * row_bytes <= _PACK_ONCHIP_BYTES:
        return fn(x)
    rows = _chunk_count(row_bytes)
    nb = -(-h // rows)
    xp = jnp.pad(x, ((0, nb * rows - h), (0, 0)))
    out = jax.lax.map(fn, xp.reshape(nb, rows, x.shape[1]))
    return out.reshape(nb * rows, -1)[:h]


def pack_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Pack a (H, W) boolean mask into (H, ceil(W/32)) uint32 words,
    LSB-first (bit j of word k = column k*32 + j).

    The (rows, Ww, 32) shift-and-reduce looks naive but measures FASTER on
    TPU than a bitcast+SWAR nibble-gather chain (18 us vs 104 us at 1080p,
    tools/hyster_breakdown.py): the 3-D byte bitcasts force Mosaic
    relayouts, while XLA fuses this form into one pass. On mega-frames the
    pass runs row-chunked so its uint32 expansion stays on-chip (see
    _PACK_ONCHIP_BYTES)."""
    h, w = mask.shape
    ww = -(-w // 32)
    m = jnp.pad(mask, ((0, 0), (0, ww * 32 - w)))

    def pack_rows(rows_bool):
        r = rows_bool.shape[0]
        expanded = rows_bool.reshape(r, ww, 32).astype(jnp.uint32)
        return jnp.sum(expanded << _bit_iota(), axis=-1, dtype=jnp.uint32)

    return _chunk_rows(pack_rows, m, h, ww * 32 * 4)


def unpack_mask(words: jnp.ndarray, width: int) -> jnp.ndarray:
    """Inverse of pack_mask: (H, Ww) uint32 -> (H, width) bool."""
    h, ww = words.shape

    def unpack_rows(rows_u32):
        bits = (rows_u32[:, :, None] >> _bit_iota()) & np.uint32(1)
        # -> bool INSIDE the chunk: a full-frame uint32 bit plane is the
        # exact off-chip expansion the chunking exists to avoid.
        return bits.reshape(rows_u32.shape[0], ww * 32).astype(jnp.bool_)

    return _chunk_rows(unpack_rows, words, h, ww * 32 * 4)[:, :width]


def pack_pair(thresh: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack the FINAL and CANDIDATE masks of a (H, W) uint8 threshold map,
    returning both planes in the TRANSPOSED (Ww, H) compute layout.

    Two regimes, picked by whether ONE mask's uint32 expansion fits the
    on-chip budget (all variants measured on hardware, tools/pack_probe.py):

    * small frames (<= ~1080p): two separate pack_mask passes — each 8.3 MB
      expansion stays on-chip and XLA fuses them cleanly into the engine
      program (the fused pair holds 16.6 MB live and spills: 18 -> 53 us
      standalone chunked, +14% on the engine headline).
    * mega frames: ONE fused chunked pass reading ``thresh`` once for both
      masks (8K: 734 us as two pack_mask calls -> 456 us), budgeting 2x
      per row since both expansions are live at once."""
    h, w = thresh.shape
    ww = -(-w // 32)
    if h * ww * 32 * 4 <= _PACK_ONCHIP_BYTES:
        return (
            pack_mask(thresh == np.uint8(FINAL_EDGE)).T,
            pack_mask(thresh == np.uint8(CANDIDATE_EDGE)).T,
        )

    def pair_rows(t_rows):
        r = t_rows.shape[0]
        tr = t_rows.reshape(r, ww, 32)
        io = _bit_iota()
        f = jnp.sum(
            (tr == np.uint8(FINAL_EDGE)).astype(jnp.uint32) << io,
            axis=-1, dtype=jnp.uint32,
        )
        p = jnp.sum(
            (tr == np.uint8(CANDIDATE_EDGE)).astype(jnp.uint32) << io,
            axis=-1, dtype=jnp.uint32,
        )
        # Stack so _chunk_rows sees one array out per chunk.
        return jnp.stack([f, p])

    # Both mask expansions are live at once in this pass: budget 2x per row
    # (always chunked here — the single-expansion early return above already
    # took every frame small enough to run unchunked).
    row_bytes = 2 * ww * 32 * 4
    tp = jnp.pad(thresh, ((0, 0), (0, ww * 32 - w))) if w != ww * 32 else thresh
    rows = _chunk_count(row_bytes)
    nb = -(-h // rows)
    tp = jnp.pad(tp, ((0, nb * rows - h), (0, 0)))
    fp = jax.lax.map(pair_rows, tp.reshape(nb, rows, ww * 32))
    fp = fp.transpose(1, 0, 2, 3).reshape(2, nb * rows, ww)[:, :h]
    return fp[0].T, fp[1].T


# Internal compute layout is the TRANSPOSE of the packed format: (Ww, H)
# words-by-image-rows, so the image-row axis (length H, e.g. 1080) is the
# minor/lane axis. XLA pads the minor axis to the 128-lane tile; with the
# word axis minor (Ww = 60 at 1080p) every VPU op wasted 2.1x lanes —
# transposing measured 21% faster hysteresis at 1080p (docs/performance.md).


def _shift_words(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i, :] = x[i-k, :], zero fill (whole-word = 32-pixel shifts;
    words are the MAJOR axis of the transposed compute layout)."""
    if k == 0:
        return x
    ww = x.shape[0]
    if k > 0:
        return jnp.pad(x, ((k, 0), (0, 0)))[:ww]
    return jnp.pad(x, ((0, -k), (0, 0)))[-k:]


def _shift_rows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[:, i] = x[:, i-k], zero fill (image rows: the MINOR axis of the
    transposed compute layout)."""
    if k == 0:
        return x
    h = x.shape[1]
    if k > 0:
        return jnp.pad(x, ((0, 0), (k, 0)))[:, :h]
    return jnp.pad(x, ((0, 0), (0, -k)))[:, -k:]


def _shift_px(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Shift the packed bit stream by ``s`` pixels along the row axis:
    out[px] = x[px - s] (zero fill at the borders)."""
    if s == 0:
        return x
    q, r = divmod(abs(s), 32)
    if s > 0:
        base = _shift_words(x, q)
        if r == 0:
            return base
        return (base << np.uint32(r)) | (
            _shift_words(base, 1) >> np.uint32(32 - r)
        )
    base = _shift_words(x, -q)
    if r == 0:
        return base
    return (base >> np.uint32(r)) | (
        _shift_words(base, -1) << np.uint32(32 - r)
    )


def _doubling_steps(extent: int) -> Tuple[int, ...]:
    """Powers of two < extent (a scan with these steps covers any run)."""
    steps = []
    s = 1
    while s < extent:
        steps.append(s)
        s *= 2
    return tuple(steps)


def _scan_dir(f, p, shift, steps: Sequence[int]):
    """Resolve promotion along one direction: inclusive doubling scan of
    (generate, propagate) transfer pairs. ``shift(x, s)`` must fetch the
    value ``s`` cells *upstream* (where the carry comes from); zero fill is
    the correct boundary (no edges enter from outside the frame)."""
    g, pp = f, p
    for s in steps:
        gs = shift(g, s)
        ps = shift(pp, s)
        g = g | (pp & gs)
        pp = pp & ps
    return g


def _dilate8_packed(
    f: jnp.ndarray, p: jnp.ndarray, exact: bool = True
) -> jnp.ndarray:
    """One promotion step: f | (p & 8-neighborhood-OR(f)), bit-parallel.
    Vertical neighbors first, then horizontal over the vertical OR (the
    2-pass factorization): 2 row shifts + 2 one-pixel bit shifts.

    ``exact=False`` drops the cross-word horizontal carry (the
    ``_shift_words`` copy + merge per direction, ~6 of the step's ~17 VPU
    ops): plain ``v<<1 | v>>1`` propagates horizontally only WITHIN each
    32-px word. That under-approximates one step — a front sitting at a
    word boundary stalls until the next exact step — but promotion stays
    monotone and below the fixed point, so it is always safe as an
    *intermediate* step. Every round's LAST step must be exact: then
    "round produced no growth" still implies the true dilation fixed point
    and the convergence loop exits at exactly the oracle's answer."""
    v = f | _shift_rows(f, 1) | _shift_rows(f, -1)
    if exact:
        h = v | _shift_px(v, 1) | _shift_px(v, -1)
    else:
        h = v | (v << np.uint32(1)) | (v >> np.uint32(1))
    return f | (p & h)


#: Exact (cross-word-carry) dilation cadence inside a fused round: every
#: ``_CARRY_EVERY``-th step and the round's last step run exact, the rest
#: carry-free (cheap). Swept on hardware (tools/round_op_probe.py):
#: full-convergence loop 130 -> 114 us at 1080p, 895 -> 688 us at 4K going
#: ce1 -> ce8; ce16 is within noise of ce8 at both sizes, ce8 keeps the
#: word-boundary stall window shorter on adversarial content. The same
#: probe shows truncated carry-lookahead "chase" rounds LOSE on real
#: scenes (1.7-3.5 ms at 4K: a fixed direction order follows only ~2 chain
#: segments per round), which is why phase 1 stays pure dilations.
_CARRY_EVERY = 8


def _make_ops(h: int, w: int, dilate_steps: int,
              carry_every: int = _CARRY_EVERY):
    """Build the two promotion operators: ``dilates`` = dilate_steps fused
    bit-parallel dilations (with the ``carry_every`` exactness cadence);
    ``scans`` = the 8-direction doubling scans.
    Both are monotone and dominated by the fixed point, so the converged
    result is identical whatever mix runs — the mix only trades per-round
    cost against rounds needed (see docs/performance.md)."""
    hsteps = _doubling_steps(w)
    vsteps = _doubling_steps(h)
    dsteps = _doubling_steps(min(h, w))
    directions = (
        (lambda x, s: _shift_px(x, s), hsteps),        # left -> right
        (lambda x, s: _shift_px(x, -s), hsteps),       # right -> left
        (lambda x, s: _shift_rows(x, s), vsteps),      # top -> bottom
        (lambda x, s: _shift_rows(x, -s), vsteps),     # bottom -> top
        (lambda x, s: _shift_px(_shift_rows(x, s), s), dsteps),    # down-right
        (lambda x, s: _shift_px(_shift_rows(x, -s), -s), dsteps),  # up-left
        (lambda x, s: _shift_px(_shift_rows(x, s), -s), dsteps),   # down-left
        (lambda x, s: _shift_px(_shift_rows(x, -s), s), dsteps),   # up-right
    )

    def scans(f, p):
        for shift, steps in directions:
            f = _scan_dir(f, p, shift, steps)
        return f

    def dilates(f, p):
        for i in range(1, dilate_steps + 1):
            exact = (i % carry_every == 0) or (i == dilate_steps)
            f = _dilate8_packed(f, p, exact=exact)
        return f

    return dilates, scans


def hysteresis_packed(
    thresh: jnp.ndarray,
    max_iters: int = 100,
    remove_candidates: bool = True,
    return_iters: bool = False,
    dilate_steps: int = 16,
    scan_after: int = 10,
):
    """Global hysteresis fixed point of a (H, W) uint8 threshold map.

    Two escalating phases (two sequential while_loops — no data-dependent
    branching inside a loop body, which XLA:TPU handles poorly):

    1. rounds of ``dilate_steps`` fused bit-parallel dilations — optimal for
       real scenes, whose chains are windy (each dilation is ~8 VPU ops on
       1/32nd the pixels);
    2. if still growing after ``scan_after`` such rounds (long straight
       runs), rounds escalate to dilations + the 8-direction carry-lookahead
       scans, which promote whole monotone runs at once.

    ``max_iters`` caps total rounds — the reference's 100-relaunch safety
    belt (cannyEdgeH.cu:313); one phase-1 round covers >= dilate_steps
    pixels of propagation, a phase-2 round additionally any monotone run.
    Like the reference (which always launches once before reading the
    flag), at least ONE round runs: max_iters=0 still propagates up to
    dilate_steps pixels.
    """
    h, w = thresh.shape
    # Transposed compute layout (see _shift_words): one 260 KB transpose
    # each way, 21% less VPU time every round. pack_pair reads thresh once
    # for both masks (chunked on mega-frames).
    f, p = pack_pair(thresh)
    dilates, scans = _make_ops(h, w, dilate_steps)

    def count(f):
        return jnp.sum(jax.lax.population_count(f), dtype=jnp.int32)

    # Phase 1 first round unconditionally; loop while the FINAL count grows
    # (promotion is monotone, so count growth == change).
    f1 = dilates(f, p)

    def cond1(state):
        _, prev, cur, it = state
        return (cur > prev) & (it < min(scan_after, max_iters))

    def body1(state):
        f, _, cur, it = state
        nf = dilates(f, p)
        return nf, cur, count(nf), it + 1

    state = jax.lax.while_loop(
        cond1, body1, (f1, count(f), count(f1), jnp.int32(1))
    )

    def cond2(state):
        _, prev, cur, it = state
        return (cur > prev) & (it < max_iters)

    def body2(state):
        f, _, cur, it = state
        nf = scans(dilates(f, p), p)
        return nf, cur, count(nf), it + 1

    # Entered only if phase 1 hit its round cap while still growing.
    f_fix, _, _, iters = jax.lax.while_loop(cond2, body2, state)

    reached = unpack_mask(f_fix.T, w)
    if remove_candidates:
        out = jnp.where(reached, jnp.uint8(FINAL_EDGE), jnp.uint8(NO_EDGE))
    else:
        out = jnp.where(reached, jnp.uint8(FINAL_EDGE), thresh)
    if return_iters:
        return out, iters
    return out
