"""Fused feed-forward Canny stages as one Pallas TPU kernel.

The reference runs gaussian/sobel/NMS/threshold as four separate CUDA kernels,
each doing a full HBM round trip through its own shared-memory tile
(cannyEdgeD.cu:72-293; launch geometry cannyEdgeH.cu:229-295). On TPU the
whole chain is one kernel: the frame is cut into full-width row slabs, each
slab (plus its stencil halo) is DMA'd HBM->VMEM once with double buffering,
every stage runs back-to-back on the VPU without leaving VMEM, and only the
final stage's uint8 buffer is written back. Per frame that is ONE HBM read of
the mono plane and ONE HBM write of the output — the memory traffic floor for
the operator.

Stencil taps are ``pltpu.roll`` shifts (native sublane/lane rotates): every
array keeps the full slab shape and ONE layout, so Mosaic never inserts
relayout chains (misaligned value slices and pad/concat idioms each proved
catastrophically slow or uncompilable). Rolled-in wraparound values only ever
land inside the slab's padding ring, strictly outside every consumer's
region. The stencils exploit the taps' symmetry: the 5x5 Gaussian is 4
sublane rolls + 4 lane rolls (vs 24 naive shifts) by pre-summing symmetric
row pairs and pre-combining column groups; Sobel is separable (a shared
vertical/horizontal smooth + one differencing roll pair each).

All arithmetic is the framework's exact integer semantics (see
cudacam_tpu/ops/numpy_oracle.py): the Pallas output is bit-identical to the
NumPy oracle and the XLA backend. Notably the Gaussian normalisation
(floor-divide by the tap sum, 159 for the 5x5 kernel of cannyEdgeH.cu:372-380)
is a verified magic multiply+shift, because integer division is not a native
VPU op. Out-of-image positions are forced to zero by 0/1 multiply-masks (the
reference's zero-padded tile fill, cannyEdgeD.cu:91-98) — multiplies, not
selects, so no cross-bitwidth i1 mask relayouts are needed.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudacam_tpu.config import GAUSSIAN_TAPS, gaussian_kernel_sum
from cudacam_tpu.ops import numpy_oracle as oracle
from cudacam_tpu.stages import CANDIDATE_EDGE, FINAL_EDGE, NO_EDGE, CannyStage

#: Slab row padding (cells top and bottom): >= the largest stencil chain halo
#: (7x7 gaussian (3) + sobel (1) + NMS (1) = 5) and a multiple of the 8-row
#: uint8 DMA granule.
PAD_R = 8
#: Left column padding: >= the halo and a multiple of the 128-lane granule,
#: so the output emit slice starts lane-aligned.
PAD_C = 128


def _slab_w(width: int) -> int:
    """Total slab width: >= width + PAD_C + max halo, 128-lane aligned."""
    return ((width + PAD_C + 8 + 127) // 128) * 128


def _total_halo(kernel_size: int) -> int:
    """Cumulative stencil halo of the fused chain for this kernel size."""
    return kernel_size // 2 + 1 + 1


#: floor(x / s) as exact multiply+shift for x in [0, 255*s], verified
#: exhaustively for every supported tap sum (tests/test_pallas_ops.py).
_MAGIC_DIV: dict[int, Tuple[int, int]] = {
    16: (1, 4),      # 3x3 taps: power of two -> pure shift
    159: (52759, 23),  # 5x5 canonical Canny taps (cannyEdgeH.cu:372-380)
    4096: (1, 12),   # 7x7 binomial taps
}


#: VMEM working-set budget for auto block-height selection (bytes). The
#: scoped-stack limit is 16 MB; leave headroom for the double-buffered input
#: slabs and pipelined output blocks.
_VMEM_BUDGET = 13_000_000

#: Effective number of concurrently-live slab-shaped int32 arrays to budget
#: for. The fused chain NAMES ~16 slab arrays, but Mosaic frees each as its
#: last consumer retires, so only ~6-8 are ever simultaneously live —
#: probed on hardware: standalone, 2.3 MB slabs (8K bh=56) compile and run
#: while 2.8 MB (8K bh=72, 1080p bh=360) exhaust VMEM; fused into the
#: engine's mono+pipeline program the same kernel's scoped accounting grows
#: ~10% (1080p bh=216 = 2.0 MB slabs: 15.x MB standalone, 17.5 MB fused ->
#: OOM), so the budget assumes 8 live slabs (max 1.6 MB each) for margin in
#: every context. Budgeting 16 costs real bandwidth: it forces 8-row slabs
#: at 8K, whose 16 padding rows per slab triple the DMA traffic (measured
#: 2075 -> ~1150 us at bh=32-48).
_LIVE_SLABS = 8


def _pick_block_h(h: int, row_bytes: int, live_arrays: int,
                  pad_rows: int) -> int:
    """Choose a slab height (multiple of 8, the uint8 row-DMA granule) such
    that ``live_arrays`` int32 slab-shaped arrays fit the VMEM budget.
    Prefers the largest divisor of ``h`` under the cap (no padded rows);
    falls back to the cap itself (rows padded up)."""
    rows = _VMEM_BUDGET // max(1, row_bytes * live_arrays)
    cap = max(8, ((rows - 2 * pad_rows) // 8) * 8)
    if live_arrays <= 10:
        # Ultra-wide frames drive the budget cap below the DMA-overhead
        # sweet spot (8K: cap 24 -> 2/5 of DMA'd rows are halo re-reads).
        # With the raised 64 MB scoped-VMEM limit a 48-row slab is safe
        # for the plain stage chain and measured distinctly faster
        # (8K THRESH: 1342 us at bh=24 vs 1157 at 48,
        # tools/mega8k_bh_probe.py). NMSQ/all-stage variants carry more
        # live arrays and keep the conservative cap.
        cap = max(cap, 48)
    if h <= cap:
        return ((h + 7) // 8) * 8
    best = None
    for bh in range(8, cap + 1, 8):
        if h % bh == 0:
            best = bh
    return best if best is not None else cap


def _sub(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[r, c] = x[r + k, c] (rows wrap into the padding ring)."""
    return pltpu.roll(x, (-k) % x.shape[0], 0) if k else x


def _lan(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[r, c] = x[r, c + k] (cols wrap into the padding ring)."""
    return pltpu.roll(x, (-k) % x.shape[1], 1) if k else x


def _gaussian_rolled(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Un-normalised integer Gaussian: sum_t T[dy,dx] * x[r+dy, c+dx].

    Exploits the taps' twofold symmetry (T[dy,:] == T[-dy,:] and
    T[:,dx] == T[:,-dx], true of every supported kernel): symmetric row pairs
    are pre-summed (r sublane rolls + r adds), each column group is combined
    once (r+1 fused multiply-adds), and only 2r lane rolls remain.
    """
    T = np.asarray(GAUSSIAN_TAPS[kernel_size], dtype=np.int64)
    r = kernel_size // 2
    assert (T == T[::-1]).all() and (T == T[:, ::-1]).all()
    # Row-symmetric partial sums: S[0] = x, S[k] = x[r-k] + x[r+k].
    S = [x]
    for k in range(1, r + 1):
        S.append(_sub(x, -k) + _sub(x, k))
    # Column groups: P[c] applies column r+c's weights over the row sums.
    P = []
    for c in range(0, r + 1):
        acc = None
        for k in range(0, r + 1):
            t = int(T[r + k, r + c])
            term = S[k] * t if t != 1 else S[k]
            acc = term if acc is None else acc + term
        P.append(acc)
    out = P[0]
    for c in range(1, r + 1):
        out = out + _lan(P[c], -c) + _lan(P[c], c)
    return out


def planar_ingest_mono(
    frame_hbm,
    slab,
    sems,
    i,
    *,
    bh: int,
    n_blocks: int,
    img_h: int,
    width: int,
    batch_idx=None,
    n_batch: int = 1,
) -> jnp.ndarray:
    """Raw frame -> i32 mono slab for grid step ``i``: prefetching clamped
    slab DMA (double buffered into the ``slab`` ring), in-kernel zero fill
    of the ring the clamped DMA leaves unfilled, and — for (3, H, W)
    planar BGR input — the fused fixed-point mono conversion; a (H, W)
    grayscale frame (the reference's channels=1 config) takes the same
    clamp/fill path with the channel dimension dropped (slab ring
    (2, slab_h, sw)) and a plain upcast. Shared by the standalone
    feed-forward kernel and the megakernel — the ingest contract exists
    exactly once, like ``_stage_chain`` for the stage math. Requires
    h % 8 == 0, w % 128 == 0 and bh % 8 == 0 (the u8 DMA granules;
    callers gate via ops/pallas/canny._planar_ok)."""
    slab_h = bh + 2 * PAD_R
    # ``batch_idx`` (a traced grid scalar) selects one frame of a BATCHED
    # (B, [3,] H, W) input — the batched megakernel's grid runs (b, i)
    # with the same per-frame DMA schedule (megakernel.canny_mega_batched).
    # Slot accounting then runs on the GLOBAL step g = b*n_blocks + i so
    # the double buffer carries ACROSS frame boundaries: each frame's
    # last block prefetches the NEXT frame's block 0 (``n_batch`` > 1),
    # removing the per-frame block-0 DMA bubble. Single-frame callers
    # (batch_idx None) are byte-identical to the pre-batched form
    # (g == i, no cross-frame branch).
    rank = len(frame_hbm.shape) - (0 if batch_idx is None else 1)
    gray = rank == 2  # static: input rank picks the form
    g = i if batch_idx is None else batch_idx * n_blocks + i

    # Clamped windows: rows [block*bh - PAD_R, block*bh + bh + PAD_R)
    # intersected with [0, h). With h % 8 == 0 and bh % 8 == 0 every
    # branch's row count/offset stays a static multiple of 8 (the u8
    # row-DMA granule); exactly one branch runs per block index.
    last = n_blocks - 1
    n_last = img_h - last * bh + PAD_R  # rows available for the last slab

    def _dma(src0, dst0, n, slot, bidx):
        # pl.multiple_of: the traced row offsets are bh-multiples +- the
        # 8-row PAD_R, but Mosaic can't prove that on its own ("Failed
        # to prove that a tile index ... is divisible by the tiling").
        rows = pl.ds(pl.multiple_of(src0, 8), n)
        if gray:
            src = (
                frame_hbm.at[rows, :]
                if bidx is None
                else frame_hbm.at[bidx, rows, :]
            )
            return pltpu.make_async_copy(
                src,
                slab.at[slot, pl.ds(dst0, n), pl.ds(PAD_C, width)],
                sems.at[slot],
            )
        src = (
            frame_hbm.at[:, rows, :]
            if bidx is None
            else frame_hbm.at[bidx, :, rows, :]
        )
        return pltpu.make_async_copy(
            src,
            slab.at[slot, :, pl.ds(dst0, n), pl.ds(PAD_C, width)],
            sems.at[slot],
        )

    def _each_branch(block_idx, slot, act, bidx=batch_idx):
        if n_blocks == 1:
            act(_dma(0, PAD_R, img_h, slot, bidx))
            return

        @pl.when(block_idx == 0)
        def _():
            act(_dma(0, PAD_R, bh + PAD_R, slot, bidx))

        @pl.when((block_idx > 0) & (block_idx < last))
        def _():
            act(_dma(block_idx * bh - PAD_R, 0, slab_h, slot, bidx))

        @pl.when(block_idx == last)
        def _():
            act(_dma(last * bh - PAD_R, 0, n_last, slot, bidx))

    @pl.when(g == 0)
    def _():
        _each_branch(0, 0, lambda d: d.start())

    @pl.when(i + 1 < n_blocks)
    def _():
        _each_branch(i + 1, (g + 1) % 2, lambda d: d.start())

    if batch_idx is not None and n_batch > 1:
        # Cross-frame prefetch: frame b's last block starts frame b+1's
        # block 0 into the other slot — the double buffer never drains
        # at a frame boundary.
        @pl.when((i == last) & (batch_idx + 1 < n_batch))
        def _():
            _each_branch(
                0, (g + 1) % 2, lambda d: d.start(), bidx=batch_idx + 1
            )

    _each_branch(i, g % 2, lambda d: d.wait())

    # Zero the slab ring the clamped DMA leaves unfilled — the zero
    # padding semantics the XLA pad pass provided on the mono path
    # (reference zero-fills its shared-memory tiles, cannyEdgeD.cu:91-98).
    # Column margins only depend on the buffer, not the block: zero them
    # once per buffer (global steps 0 and 1), after wait() so the stores
    # cannot overlap this buffer's in-flight fill.
    sw = slab.shape[-1]
    slot = g % 2
    fill_last = (img_h + PAD_R) if n_blocks == 1 else n_last

    def _fill(rows, cols, n_rows, n_cols):
        z = jnp.zeros(
            (n_rows, n_cols) if gray else (3, n_rows, n_cols), jnp.uint8
        )
        if gray:
            slab[slot, rows, cols] = z
        else:
            slab[slot, :, rows, cols] = z

    @pl.when(g <= 1)
    def _():
        _fill(slice(None), slice(None, PAD_C), slab_h, PAD_C)
        _fill(slice(None), slice(PAD_C + width, None), slab_h,
              sw - PAD_C - width)

    @pl.when(i == 0)
    def _():
        _fill(slice(None, PAD_R), slice(PAD_C, None), PAD_R, sw - PAD_C)

    @pl.when(i == n_blocks - 1)
    def _():
        _fill(slice(fill_last, None), slice(PAD_C, None),
              slab_h - fill_last, sw - PAD_C)

    if gray:
        return slab[slot].astype(jnp.int32)

    # --- 1/6 BGR -> mono fused into the slab (cannyEdgeD.cu:53-69):
    # weights sum to 64, so acc >> 6 <= 255 and the oracle's min(255, .)
    # is vacuous (oracle.rgb2mono).
    from cudacam_tpu.ops.numpy_oracle import B_WT, G_WT, R_WT

    return (
        slab[slot, 0].astype(jnp.int32) * B_WT
        + slab[slot, 1].astype(jnp.int32) * G_WT
        + slab[slot, 2].astype(jnp.int32) * R_WT
    ) >> 6


def _valid_mask_i32(i, row0, col0, shape: Tuple[int, int], bh: int,
                    height: int, width: int) -> jnp.ndarray:
    """0/1 int32 mask of slab positions inside the global image. Slab [0,0]
    sits at global pixel (row0 + i*bh - PAD_R, col0 - PAD_C); (row0, col0)
    is the caller's tile origin within the global image (nonzero when the
    input is one halo-extended shard of a sharded frame).

    Built as the outer product of 1-D row/column masks: the iota/compare
    work runs on (rows, 1) and (1, cols) strips, so only ONE op (the
    broadcasting multiply) touches the full slab — the naive 2-D
    iota+compare form costs ~7 full-slab VPU passes."""
    rows = row0 + i * bh - PAD_R + jax.lax.broadcasted_iota(
        jnp.int32, (shape[0], 1), 0
    )
    cols = col0 - PAD_C + jax.lax.broadcasted_iota(jnp.int32, (1, shape[1]), 1)
    rows_ok = ((rows >= 0) & (rows < height)).astype(jnp.int32)
    cols_ok = ((cols >= 0) & (cols < width)).astype(jnp.int32)
    return rows_ok * cols_ok


def _kernel_body(
    lo_ref,
    hi_ref,
    origin_ref,
    mono_hbm,
    *refs,
    bh: int,
    width: int,
    img_h: int,
    img_w: int,
    kernel_size: int,
    grad_coeff: int,
    norm: str,
    parity: str,
    out_stages: Tuple[CannyStage, ...],
    n_blocks: int,
    planar: bool,
    use_origin: bool,
):
    """Grid step i: consume slab i (prefetched), prefetch slab i+1, run the
    fused stage chain in VMEM, emit one output block per requested stage
    (``out_stages`` is pipeline-ordered; the chain stops after the last).
    Multi-stage emission is how process_all keeps every display buffer in
    ONE kernel pass instead of one pass per stage (README.md:22 analog).

    ``planar=False``: the input is the PRE-PADDED (Hp, SW) mono plane and
    every slab DMA window is in range by construction.

    ``planar=True``: the input is the RAW (3, H, W) planar BGR frame — no
    XLA pre-pass at all (the reference's one-upload-per-frame property,
    README.md:14; upload at cannyEdgeH.cu:136, done one better: zero
    device-side passes before the kernel). Slab DMA windows are clamped to
    the frame and the unfilled slab ring is zeroed in-kernel (the zero
    padding the XLA pass used to provide); BGR->mono (cannyEdgeD.cu:53-69
    fixed point) runs on the slab before the stage chain. Requires
    h % 8 == 0 and w % 128 == 0 (DMA granules) — callers fall back to the
    mono path otherwise (ops/pallas/canny.py)."""
    out_refs = refs[: len(out_stages)]
    slab, sems = refs[len(out_stages) :]
    slab_h = bh + 2 * PAD_R
    i = pl.program_id(0)

    # Whole chain in one slab-shaped i32 coordinate frame; [0,0] sits at
    # global pixel (origin + (i*bh - PAD_R, -PAD_C)).
    if planar:
        mono = planar_ingest_mono(
            mono_hbm, slab, sems, i,
            bh=bh, n_blocks=n_blocks, img_h=img_h, width=width,
        )
    else:

        def start_fetch(slot, block_idx):
            # Input rows are pre-padded by PAD_R top/bottom, so the slab
            # window [block*bh, block*bh + slab_h) is always in range.
            return pltpu.make_async_copy(
                mono_hbm.at[pl.ds(block_idx * bh, slab_h), :],
                slab.at[slot],
                sems.at[slot],
            )

        @pl.when(i == 0)
        def _():
            start_fetch(0, 0).start()

        @pl.when(i + 1 < n_blocks)
        def _():
            start_fetch((i + 1) % 2, i + 1).start()

        start_fetch(i % 2, i).wait()
        mono = slab[i % 2].astype(jnp.int32)
    # use_origin is STATIC: with no tile origin the literal zeros let the
    # valid-mask strips constant-fold (traced origin scalars measured
    # ~+6.5 us/frame at 1080p on the megakernel — same effect here).
    o_r = origin_ref[0] if use_origin else jnp.int32(0)
    o_c = origin_ref[1] if use_origin else jnp.int32(0)
    valid = _valid_mask_i32(i, o_r, o_c, mono.shape, bh, img_h, img_w)

    def emit(stage, x_i32: jnp.ndarray) -> None:
        if stage in out_stages:
            core = x_i32[PAD_R : PAD_R + bh, PAD_C : PAD_C + width]
            out_refs[out_stages.index(stage)][:, :] = (
                core if stage == "NMSQ" else core.astype(jnp.uint8)
            )

    # MONO is emitted here, not by the stage chain: on the planar path it
    # is the in-slab conversion's result (the all-stages display mode gets
    # its mono buffer from the same single pass — no XLA pre-pass at all).
    emit(CannyStage.MONO, mono)
    chain_stages = tuple(s for s in out_stages if s != CannyStage.MONO)
    if chain_stages:
        _stage_chain(
            mono, valid, lo_ref[0], hi_ref[0],
            kernel_size=kernel_size, grad_coeff=grad_coeff, norm=norm,
            parity=parity, out_stages=chain_stages, emit=emit,
        )


def _stage_chain(
    mono: jnp.ndarray,
    valid: jnp.ndarray,
    lo,
    hi,
    *,
    kernel_size: int,
    grad_coeff: int,
    norm: str,
    parity: str,
    out_stages: Tuple,
    emit,
):
    """The fused gaussian->sobel->NMS->threshold chain on one slab-shaped
    i32 mono plane. ``emit(stage, x_i32)`` is called for each stage in
    ``out_stages`` (pipeline-ordered; "NMSQ" = raw keep*g int32); the
    chain stops after the last requested stage. Returns the THRESH i32
    slab when the chain runs that far (the megakernel packs it straight
    from VMEM, ops/pallas/megakernel.py), else None. Shared by every
    Pallas pipeline kernel so the stage math exists exactly once."""
    last = out_stages[-1]

    # --- 2/6 Gaussian (cannyEdgeD.cu:72-118), exact floor-div by tap sum ---
    ksum = gaussian_kernel_sum(kernel_size)
    magic, shift = _MAGIC_DIV[ksum]
    acc = _gaussian_rolled(mono, kernel_size)
    blur = (acc * magic) >> shift if magic != 1 else acc >> shift
    blur = blur * valid  # zero outside the image (0/1 multiply-mask)

    emit(CannyStage.GAUSSIAN, blur)
    if last == CannyStage.GAUSSIAN:
        return None

    # --- 3/6 Sobel (cannyEdgeD.cu:121-172), separable integer stencils -----
    # X = [1,2,1]^T x [-1,0,1]; Y = [1,2,1] smoothing x top-minus-bottom.
    # Lane (horizontal) rolls cost ~3x a sublane roll on this hardware, so
    # only the two +-1 column shifts of blur are lane rolls; the vertical
    # smooths of the shifted columns reuse them with sublane rolls
    # (vsmooth(shift(x)) == shift(vsmooth(x))).
    bl = _lan(blur, -1)  # blur[r, c-1]
    br = _lan(blur, 1)   # blur[r, c+1]
    hsm = bl + 2 * blur + br
    sum_y = _sub(hsm, -1) - _sub(hsm, 1)
    vsm_l = _sub(bl, -1) + 2 * bl + _sub(bl, 1)
    vsm_r = _sub(br, -1) + 2 * br + _sub(br, 1)
    sum_x = vsm_r - vsm_l
    # sum_x/sum_y are NOT masked here: every emitted center pixel is
    # in-image, so only the neighbor-valued arrays derived from them need
    # out-of-image zeroing — one mask multiply on g (below) covers the NMS
    # neighborhood reads, replacing two full-slab multiplies with one.

    # Exact uint8 magnitude: isqrt via f32 sqrt + integer fixup (values
    # < 2^24 so the float path is exact; see oracle.nms_magnitude_u8).
    # Display coefficient is the reference's grad_coeff in 'reference'
    # parity; 8 in 'opencv' parity ((s*8)>>3 == s, the raw Sobel magnitude).
    disp_coeff = grad_coeff if parity == "reference" else 8

    _mag = []

    def magnitude_i32() -> jnp.ndarray:
        if _mag:  # computed at most once even when GRADIENT and NMS both emit
            return _mag[0]
        if norm == "l2":
            m = sum_x * sum_x + sum_y * sum_y
            s = jnp.sqrt(m.astype(jnp.float32)).astype(jnp.int32)
            s = jnp.where(s * s > m, s - 1, s)
            s = jnp.where((s + 1) * (s + 1) <= m, s + 1, s)
            val = (s * disp_coeff) >> 3
        else:
            val = (disp_coeff * (jnp.abs(sum_x) + jnp.abs(sum_y))) >> 3
        _mag.append(jnp.minimum(val, 255))
        return _mag[0]

    if CannyStage.GRADIENT in out_stages:
        emit(CannyStage.GRADIENT, magnitude_i32())
    if last == CannyStage.GRADIENT:
        return None

    # --- 4/6 NMS (cannyEdgeD.cu:201-270): Q15 sector bins, ties kept -------
    # g is masked (zero outside the image) because its *rolled* values are
    # the NMS neighborhood — the reference's zero-padded tile fill.
    if norm == "l2":
        g = (sum_x * sum_x + sum_y * sum_y) * valid
    else:
        g = (jnp.abs(sum_x) + jnp.abs(sum_y)) * valid

    # Diagonal neighbors derive from the (expensive) lane-rolled gl/gr via
    # (cheap) sublane rolls: only 2 lane rolls for the whole 8-neighborhood.
    gu, gd = _sub(g, -1), _sub(g, 1)
    gl, gr_ = _lan(g, -1), _lan(g, 1)
    gul, gdl = _sub(gl, -1), _sub(gl, 1)
    gur, gdr = _sub(gr_, -1), _sub(gr_, 1)

    v = jnp.abs(sum_x) << 15
    wmag = jnp.abs(sum_y)
    folded_u = jnp.where(sum_x >= 0, sum_y, -sum_y)
    bin0 = v < wmag * oracle.TG22
    bin2 = v >= wmag * oracle.TG67

    q = jnp.where(
        bin0, gd, jnp.where(bin2, gr_, jnp.where(folded_u > 0, gdl, gul))
    )
    r = jnp.where(
        bin0, gu, jnp.where(bin2, gl, jnp.where(folded_u > 0, gur, gdr))
    )
    keep = ((q <= g) & (r <= g)).astype(jnp.int32)

    if "NMSQ" in out_stages:
        # Threshold-independent sweep state: the NMS-masked comparable
        # magnitude, emitted as RAW int32 (not a display buffer). Every
        # (low, high) threshold map is a pure scalar-bound compare against
        # this plane (xla_ops.compute_threshold_map's domains), which is
        # what lets threshold_sweep run the production kernel ONCE and
        # fan out only the data-dependent tail (ops/pallas/canny.py).
        emit("NMSQ", keep * g)
        return None

    if CannyStage.NMS in out_stages:  # guard: don't trace magnitude otherwise
        emit(CannyStage.NMS, keep * magnitude_i32())
    if last == CannyStage.NMS:
        return None

    # --- 5/6 double threshold (cannyEdgeD.cu:273-293), strict inequalities -
    if parity == "reference":
        # Threshold the reference's uint8 magnitude domain — evaluated on
        # the comparable magnitude g via exact scalar bounds, so no
        # per-pixel isqrt runs on this path (xla_ops.threshold_magnitude_
        # bound has the derivation; grad_coeff divides 8 per CannyConfig,
        # so the ceil-division is a shift).
        cshift = {1: 0, 2: 1, 4: 2, 8: 3}[grad_coeff]

        def bound_minus_1(t):
            s_min = (((t + 1) << 3) + grad_coeff - 1) >> cshift
            b = s_min * s_min if norm == "l2" else s_min
            return jnp.where(t >= 255, jnp.int32(1 << 30), b) - 1

        nms = keep * g
        lo_c, hi_c = bound_minus_1(lo), bound_minus_1(hi)
    else:
        # 'opencv' parity: threshold raw Sobel magnitudes exactly —
        # sqrt(m) > t <=> m > t*t (g already holds m, or the L1 sum).
        # Clamp to the 2048 domain cap so squaring can't overflow int32.
        nms = keep * g
        lo8 = jnp.clip(lo, 0, 2048)
        hi8 = jnp.clip(hi, 0, 2048)
        lo_c = lo8 * lo8 if norm == "l2" else lo8
        hi_c = hi8 * hi8 if norm == "l2" else hi8
    out = jnp.where(
        nms > hi_c,
        jnp.int32(FINAL_EDGE),
        jnp.where(nms > lo_c, jnp.int32(CANDIDATE_EDGE), jnp.int32(NO_EDGE)),
    )
    emit(CannyStage.THRESH, out)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size",
        "grad_coeff",
        "norm",
        "parity",
        "out_stage",
        "interpret",
        "block_h",
        "image_size",
    ),
)
def feed_forward_to_stage(
    mono: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    kernel_size: int = 5,
    grad_coeff: int = 4,
    norm: str = "l2",
    parity: str = "reference",
    out_stage: CannyStage = CannyStage.THRESH,
    interpret: bool = False,
    block_h: Optional[int] = None,
    origin=None,
    image_size: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Run gaussian -> ... -> ``out_stage`` fused in one Pallas kernel.

    ``mono`` is the (H, W) uint8 gray plane; returns that stage's (H, W)
    uint8 display buffer. ``out_stage`` must be GAUSSIAN..THRESH (MONO is a
    pointwise XLA op; HYSTER = THRESH + hysteresis_pallas).

    For sharded use, ``mono`` may be one halo-extended tile of a larger
    frame: ``origin`` is then the (row, col) of mono[0,0] in the global
    image (traced scalars; may be negative at border tiles) and
    ``image_size`` the global (H, W) — together they pin the zero-padding
    semantics to the GLOBAL image border rather than the tile border.
    """
    out_stage = CannyStage(out_stage)
    if out_stage in (CannyStage.MONO, CannyStage.HYSTER):
        raise ValueError("out_stage must be GAUSSIAN, GRADIENT, NMS or THRESH")
    return _feed_forward_multi(
        mono, low, high, (out_stage,), kernel_size, grad_coeff, norm,
        parity, interpret, block_h, origin, image_size,
    )[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size",
        "grad_coeff",
        "norm",
        "parity",
        "interpret",
        "block_h",
        "image_size",
    ),
)
def feed_forward_all_stages(
    mono: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    kernel_size: int = 5,
    grad_coeff: int = 4,
    norm: str = "l2",
    parity: str = "reference",
    interpret: bool = False,
    block_h: Optional[int] = None,
    origin=None,
    image_size: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, ...]:
    """Every feed-forward display buffer from ONE kernel pass: the chain
    runs once and each stage's uint8 block is emitted as its own output
    (vs one full pass per stage). This is the all-stages display mode's
    compute (the reference keeps every intermediary for display,
    README.md:22).

    ``mono`` may instead be the RAW (3, H, W) planar BGR frame
    (granule-eligible shapes): the kernel then ingests the frame directly
    — zero XLA pre-passes — and ALSO emits the in-slab mono conversion as
    a leading fifth buffer, so the return is (mono, gaussian, gradient,
    nms, thresh) instead of the mono-input path's four."""
    stages = (CannyStage.GAUSSIAN, CannyStage.GRADIENT, CannyStage.NMS,
              CannyStage.THRESH)
    if mono.ndim == 3:
        stages = (CannyStage.MONO,) + stages
    return _feed_forward_multi(
        mono, low, high, stages,
        kernel_size, grad_coeff, norm, parity, interpret, block_h, origin,
        image_size,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "grad_coeff", "norm", "interpret", "block_h",
        "image_size",
    ),
)
def feed_forward_nmsq(
    inp: jnp.ndarray,
    kernel_size: int = 5,
    grad_coeff: int = 4,
    norm: str = "l2",
    interpret: bool = False,
    block_h: Optional[int] = None,
    origin=None,
    image_size: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """The threshold-INDEPENDENT feed-forward state as one kernel pass:
    the NMS-masked comparable magnitude ``keep * g`` (raw int32, not a
    display buffer). Thresholding any (low, high) pair over this plane is
    a pure scalar-bound compare in either parity domain
    (xla_ops.compute_threshold_map / double_threshold_opencv), so a
    threshold sweep runs the production kernel ONCE and fans out only the
    tail (canny.threshold_sweep_pallas; reference analog would relaunch
    its whole kernel chain per pair, cannyEdgeH.cu:49-120)."""
    zero = jnp.zeros((), jnp.int32)  # thresholds unused on this path
    return _feed_forward_multi(
        inp, zero, zero, ("NMSQ",), kernel_size, grad_coeff, norm,
        "reference", interpret, block_h, origin, image_size,
    )[0]


def _feed_forward_multi(
    inp: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    out_stages: Tuple[CannyStage, ...],
    kernel_size: int,
    grad_coeff: int,
    norm: str,
    parity: str,
    interpret: bool,
    block_h: Optional[int],
    origin,
    image_size: Optional[Tuple[int, int]],
) -> Tuple[jnp.ndarray, ...]:
    planar = inp.ndim == 3
    if planar:
        _, h, w = inp.shape
        if h % 8 or w % 128:
            raise ValueError(
                "planar ingest needs h % 8 == 0 and w % 128 == 0 "
                f"(got {h}x{w}); use the mono path otherwise"
            )
    else:
        h, w = inp.shape
    gh, gw = image_size if image_size is not None else (h, w)
    if origin is None:
        origin_arr = jnp.zeros((2,), jnp.int32)
    else:
        origin_arr = jnp.stack(
            [jnp.asarray(origin[0], jnp.int32), jnp.asarray(origin[1], jnp.int32)]
        )
    sw = _slab_w(w)
    # Each extra emitted stage adds a pipelined uint8 output block (~1/4 of
    # an int32 slab, double-buffered): budget it as half a live slab. The
    # planar path's slab triples the u8 input buffer (3 channels): +1 live.
    # An int32 output block (NMSQ) is 4x a u8 one: +2 live.
    live = (
        _LIVE_SLABS
        + (len(out_stages) - 1 + 1) // 2
        + (1 if planar else 0)
        + (2 if "NMSQ" in out_stages else 0)
    )
    bh = block_h or _pick_block_h(h, sw * 4, live, PAD_R)
    n_blocks = pl.cdiv(h, bh)
    hp = n_blocks * bh

    if planar:
        # NO XLA pre-pass at all: the kernel DMAs clamped windows straight
        # out of the raw (3, H, W) frame and zero-fills the slab ring
        # itself. (On TPU the (H, W, 3) uint8 frame is stored channel-major,
        # so the transpose to planar in the caller is a free layout view.)
        kernel_in = inp
        slab_shape = (2, 3, bh + 2 * PAD_R, sw)
    else:
        # One cheap XLA pass: pad rows by the slab padding (and up to the
        # slab grid), cols to the 128-lane-aligned slab width, so every slab
        # DMA window is in-bounds and alignment-legal.
        kernel_in = jnp.pad(
            inp, ((PAD_R, PAD_R + (hp - h)), (PAD_C, sw - w - PAD_C))
        )
        slab_shape = (2, bh + 2 * PAD_R, sw)

    kern = functools.partial(
        _kernel_body,
        bh=bh,
        width=w,
        img_h=gh,
        img_w=gw,
        kernel_size=kernel_size,
        grad_coeff=grad_coeff,
        norm=norm,
        parity=parity,
        out_stages=out_stages,
        n_blocks=n_blocks,
        planar=planar,
        use_origin=origin is not None,
    )

    block = pl.BlockSpec(
        (bh, w), lambda i, lo, hi, org: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # low, high thresholds; tile origin
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[block] * len(out_stages),
        scratch_shapes=[
            pltpu.VMEM(slab_shape, jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (hp, w), jnp.int32 if s == "NMSQ" else jnp.uint8
            )
            for s in out_stages
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Allow taller slabs than the 16 MB scoped default permits
            # (v5e VMEM is physically larger; discovered via the fused
            # hysteresis kernel's 4K working set).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(low, jnp.int32).reshape(1),
        jnp.asarray(high, jnp.int32).reshape(1),
        origin_arr,
        kernel_in,
    )
    return tuple(o[:h] if hp != h else o for o in outs)
