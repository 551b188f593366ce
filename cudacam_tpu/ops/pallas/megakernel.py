"""The whole Canny pipeline as ONE Pallas kernel launch.

Composition of the two fused kernels this framework already ships —
feed-forward (feedforward.py) and hysteresis (hysteresis_fused.py) —
with the intermediate threshold map never leaving VMEM:

* grid steps run the feed-forward chain per row slab (raw planar BGR in,
  the SAME ``_stage_chain`` both kernels share) and bit-pack each slab's
  threshold values straight out of the slab registers into the packed
  hysteresis planes (persistent VMEM scratch) — the (H, W) uint8
  threshold map that used to be written to and re-read from HBM between
  the two kernels simply never exists;
* the last grid step runs the PHASE-1 dilation rounds of the shared
  ``bitpack._make_ops`` schedule (with hysteresis_fused's guard-ring
  roll shifts) and streams the unpacked edge map out through a
  double-buffered manual DMA.

Phase 2 (the 8-direction carry-lookahead scans) is deliberately NOT in
this kernel: measured on hardware, the mere *presence* of the scan code
costs ~100 us of base time at 1080p (instruction-footprint interference
— a max_iters=3 variant whose phase-2 loop could never run still paid
it; tools/mega_probe.py). When a frame is still growing after
``scan_after`` phase-1 rounds (long monotone runs — rare at 1080p,
scene-typical at 4K where chains outgrow the phase-1 propagation
budget), the kernel skips the unpack and instead exports its packed
planes + round count, and :func:`canny_mega_pipeline`'s ``lax.cond``
hands them to a phase-2 continuation that RESUMES the convergence
exactly where phase 1 stopped — zero recompute (no feed-forward re-run,
no re-pack, no phase-1 replay; the handoff is one ~MB plane round-trip
through HBM). Two continuation forms share one contract, picked by a
static size policy (:func:`_cont_xla`'s docstring): a Pallas kernel
(:func:`_cont_call`) for mega-frames, plain XLA ops (:func:`_cont_xla`)
for small frames — an untaken cond branch holding a second Mosaic
binary still costs ~12 us of device time, an untaken XLA branch
nothing. Bit-exactness is immediate either way: the continuation
executes the same ``bitpack._make_ops`` phase-2 schedule on the same
state and the same round counter, so the composition IS
``bitpack.hysteresis_packed``'s two while_loops, merely split across
two launches at the phase boundary (docs/parity.md).

Per frame, HBM is touched exactly TWICE in the common case: one read of
the raw frame, one write of the edge map. The reference touches it ~14
times (a round trip per kernel, cannyEdgeD.cu, plus the relaunch loop's
flag traffic, cannyEdgeH.cu:297-338).

Applicability (:func:`mega_ok`): planar-eligible shapes (h % 8 == 0,
w % 128 == 0 — every production size) whose packed planes fit the
hysteresis VMEM budget. Other shapes use the two-kernel path
(ops/pallas/canny.py) — identical results either way.
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
from cudacam_tpu.ops.pallas import feedforward as ff
from cudacam_tpu.ops.pallas import hysteresis_fused as hfz
from cudacam_tpu.stages import CANDIDATE_EDGE, FINAL_EDGE, CannyStage


def _pick_bh(h: int, w: int) -> int:
    """Slab height for the megakernel: a 32-multiple (each slab packs
    whole words; the packed stores are statically predicated per block,
    so no 8-word alignment constraint — v1 needed bh=256 for its dynamic
    sublane offsets). Minimise total DMA'd rows = padding past h plus
    the 2*PAD_R halo rows each slab re-reads; tie-break smaller (smaller
    live working set). Cap so ~8 live slab-sized i32 arrays stay within
    the raised 64 MB scoped-VMEM budget with margin."""
    sw = ff._slab_w(w)
    cap = 256
    while cap > 32 and (cap + 2 * ff.PAD_R) * sw * 4 * 8 > 40_000_000:
        cap -= 32
    best, best_cost = 32, None
    for bh in range(32, cap + 1, 32):
        n = -(-h // bh)
        cost = n * (bh + 2 * ff.PAD_R) - h
        if best_cost is None or cost < best_cost:
            best, best_cost = bh, cost
    return best


#: Packed-plane budget for the megakernel — LARGER than the fused
#: hysteresis kernel's (hysteresis_fused._PLANE_BUDGET): this kernel holds
#: no scan code (phase 2 lives in the continuations), so a phase-1 round's
#: live set is only ~6 plane-sized temporaries, and 8K's 4.3 MB planes
#: fit a raised scoped-VMEM cap (measured: the 8K kernel's scoped stack
#: is 73 MB — OOM at the 64 MB cap the smaller geometries use, compiles
#: at 100 MB; v5e physical VMEM is 128 MB). That is what gives 8K a
#: fused hysteresis phase 1 — the 8K-shaped SCAN kernel is the thing the
#: remote Mosaic compiler never returned on (docs/performance.md), and
#: it stays excluded: 8K phase 2 runs the XLA continuation (_cont_xla;
#: see the cont='auto' policy in canny_mega_pipeline).
_MEGA_PLANE_BUDGET = 4_500_000


def _mega_geometry(h: int, w: int) -> Optional[Tuple[int, int, int, int]]:
    """(bh, n_blocks, hwp, wp) or None when the megakernel doesn't apply."""
    if h % 8 or w % 128:
        return None
    bh = 32 if h <= 32 else _pick_bh(h, w)
    wp = w + hfz._GUARD_LANES
    if (-(-h // 32) + 1) * wp * 4 > hfz._PLANE_BUDGET:
        # Huge-plane class (8K): the persistent planes (8.5 MB) compete
        # with the slab working set, so _pick_bh's DMA-row minimiser
        # overshoots — measured on hardware (tools/mega8k_bh_probe.py):
        # bh 32/64/96/128 -> 2470/2306/2696/2668 us. Clamp to the
        # measured optimum.
        bh = min(bh, 64)
    n_blocks = -(-h // bh)
    # A trailing partial slab is fine: the slab core always spans bh
    # (32-multiple) rows, and rows past the image are valid-masked to
    # exact NO_EDGE, so whole-core packs stay on word boundaries.
    hwp = n_blocks * (bh // 32) + 1  # +1 guard word-row (roll wrap)
    if hwp * wp * 4 > _MEGA_PLANE_BUDGET:
        return None
    return bh, n_blocks, hwp, wp


def mega_ok(h: int, w: int) -> bool:
    return _mega_geometry(h, w) is not None


def _unpack_out(f_ref, outbuf, osems, out_hbm, h: int, w: int, n_words: int,
                frame_idx=None):
    """Unpack the converged FINAL plane + manual DMA out, double buffered
    per word-chunk (the pipelined out-spec path can't work in either
    caller: every output block depends on the converged global state).
    Shared by the megakernel's last grid step and the phase-2 continuation
    kernel; ``frame_idx`` targets one frame of a batched (B, H, W) output
    (the batched megakernel)."""
    io32 = jax.lax.broadcasted_iota(jnp.uint32, (32, 1), 0)
    ch_rows = outbuf.shape[1]
    ckw = ch_rows // 32
    n_out = -(-h // ch_rows)

    def out_dma(j):
        n_rows = min(ch_rows, h - j * ch_rows)
        dst = (
            out_hbm.at[pl.ds(j * ch_rows, n_rows), :]
            if frame_idx is None
            else out_hbm.at[frame_idx, pl.ds(j * ch_rows, n_rows), :]
        )
        return pltpu.make_async_copy(
            outbuf.at[j % 2, pl.ds(0, n_rows), :],
            dst,
            osems.at[j % 2],
        )

    for j in range(n_out):
        if j >= 2:  # this slot's previous DMA must land first
            out_dma(j - 2).wait()
        for k in range(ckw):
            if j * ckw + k >= n_words:
                break  # tiny frame: chunk reaches past the state
            word = f_ref[pl.ds(j * ckw + k, 1), pl.ds(0, w)]
            bits = (jnp.broadcast_to(word, (32, w)) >> io32) & jnp.uint32(1)
            outbuf[j % 2, k * 32 : (k + 1) * 32, :] = (
                bits * jnp.uint32(FINAL_EDGE)
            ).astype(jnp.uint8)
        out_dma(j).start()
    for j in range(max(0, n_out - 2), n_out):  # drain the tail
        out_dma(j).wait()


def _kernel(
    lo_ref,
    hi_ref,
    origin_ref,
    frame_hbm,
    out_hbm,
    flags_ref,
    fout_hbm,
    pout_hbm,
    slab,
    f_ref,
    p_ref,
    outbuf,
    sems,
    osems,
    *,
    bh: int,
    n_blocks: int,
    hwp: int,
    wp: int,
    h: int,
    w: int,
    img_h: int,
    img_w: int,
    ring: Tuple[int, int],
    use_origin: bool,
    export_only: bool,
    kernel_size: int,
    grad_coeff: int,
    norm: str,
    parity: str,
    dilate_steps: int,
    scan_after: int,
    max_iters: int,
    carry_every: int,
):
    i = pl.program_id(0)

    # ---- feed-forward chain to THRESH on the slab (shared stage math) ----
    # (img_h, img_w) + origin pin zero-padding to the GLOBAL image border:
    # for the unsharded path they equal (h, w) with origin 0; for a
    # sharded halo-extended tile they are the global frame dims and the
    # tile's global offset (parallel/sharded.py). use_origin is STATIC:
    # the unsharded path keeps literal zeros so the valid-mask strips
    # constant-fold (traced origin scalars measured +~7 us/frame at
    # 1080p — the r4 regression hunted down via an r3-commit worktree
    # re-measured same-day).
    o_r = origin_ref[0] if use_origin else jnp.int32(0)
    o_c = origin_ref[1] if use_origin else jnp.int32(0)
    _ingest_chain_pack(
        frame_hbm, slab, sems, f_ref, p_ref, i, lo_ref[0], hi_ref[0],
        o_r, o_c,
        bh=bh, n_blocks=n_blocks, hwp=hwp, wp=wp, h=h, w=w,
        img_h=img_h, img_w=img_w, ring=ring,
        kernel_size=kernel_size, grad_coeff=grad_coeff, norm=norm,
        parity=parity, batch_idx=None, n_batch=1,
    )

    # ---- last step: phase-1 convergence + stream the edge map out --------
    @pl.when(i == n_blocks - 1)
    def _():
        _phase1_finalize(
            f_ref, p_ref, outbuf, osems, out_hbm, fout_hbm, pout_hbm,
            flags_ref, jnp.int32(0),
            h=h, w=w, hwp=hwp, wp=wp, n_pack=hwp - 1,
            dilate_steps=dilate_steps, scan_after=scan_after,
            max_iters=max_iters, carry_every=carry_every,
            export_only=export_only, frame_idx=None,
        )


def _ingest_chain_pack(
    frame_hbm,
    slab,
    sems,
    f_ref,
    p_ref,
    i,
    lo,
    hi,
    o_r,
    o_c,
    *,
    bh: int,
    n_blocks: int,
    hwp: int,
    wp: int,
    h: int,
    w: int,
    img_h: int,
    img_w: int,
    ring: Tuple[int, int],
    kernel_size: int,
    grad_coeff: int,
    norm: str,
    parity: str,
    batch_idx,
    n_batch: int,
):
    """The megakernel's per-block FRONT half, shared by the single-frame
    and batched kernels: raw planar ingest (feedforward.planar_ingest_mono
    — the ingest contract exists once, like ``_stage_chain`` for the
    stage math), the feed-forward chain to THRESH on the slab, and the
    in-register bit-pack into the persistent planes.

    Pack notes: thresh is the i32 slab; its core is
    [PAD_R, PAD_R+bh) x [PAD_C, ..). Everywhere outside the image — the
    last slab's rows past h AND the guard lanes [w, wp) — thresh is exact
    NO_EDGE already (g carries the valid mask, so nms=0 and the strict >
    comparisons yield 0), so whole-core packs land zeros in every
    pad/guard position for free; sw - PAD_C == w + 128 == wp exactly when
    w % 128 == 0 (mega_ok). The stores are STATICALLY predicated per
    block: Mosaic requires DYNAMIC sublane store offsets to be provably
    8-aligned (which would force kw % 8 == 0, i.e. 256-row slabs and
    their padding waste) — a per-block pl.when with a Python-int offset
    has no such constraint."""
    kw = bh // 32
    mono = ff.planar_ingest_mono(
        frame_hbm, slab, sems, i, bh=bh, n_blocks=n_blocks, img_h=h,
        width=w, batch_idx=batch_idx, n_batch=n_batch,
    )
    valid = ff._valid_mask_i32(i, o_r, o_c, mono.shape, bh, img_h, img_w)
    thresh = ff._stage_chain(
        mono, valid, lo, hi,
        kernel_size=kernel_size, grad_coeff=grad_coeff, norm=norm,
        parity=parity, out_stages=(CannyStage.THRESH,),
        emit=lambda stage, x: None,
    )
    core = thresh[ff.PAD_R : ff.PAD_R + bh, ff.PAD_C : ff.PAD_C + wp]
    ring_r, ring_c = ring
    if ring_r or ring_c:
        # Sharded tiles: zero the POLLUTION ring — positions within
        # ``ring`` (= the feed-forward stencil halo) of the extended
        # tile's edge read zero-filled slab cells where the true image
        # has neighbor pixels beyond the exchanged halo, so their stage
        # outputs are junk there (exact only at global borders, which
        # the valid mask already zeroed). Per-axis: a mesh axis with one
        # shard has no extension and no pollution (the tile edge IS the
        # global border there). Same 1-D outer-product shape as the
        # valid mask; the column mask also re-zeros the guard lanes
        # [ext_w, wp).
        rr = i * bh + jax.lax.broadcasted_iota(jnp.int32, (bh, 1), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
        rok = ((rr >= ring_r) & (rr < h - ring_r)).astype(jnp.int32)
        cok = ((cc >= ring_c) & (cc < w - ring_c)).astype(jnp.int32)
        core = core * (rok * cok)
    io = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
    fw = jnp.sum(
        (core == FINAL_EDGE).astype(jnp.int32).reshape(kw, 32, wp) << io,
        axis=1, dtype=jnp.int32,
    ).astype(jnp.uint32)
    pw = jnp.sum(
        (core == CANDIDATE_EDGE).astype(jnp.int32).reshape(kw, 32, wp) << io,
        axis=1, dtype=jnp.int32,
    ).astype(jnp.uint32)
    for j in range(n_blocks):

        @pl.when(i == j)
        def _(j=j):
            f_ref[j * kw : (j + 1) * kw, :] = fw
            p_ref[j * kw : (j + 1) * kw, :] = pw


def _phase1_finalize(
    f_ref,
    p_ref,
    outbuf,
    osems,
    out_hbm,
    fout_dst,
    pout_dst,
    flags_ref,
    flags_row,
    *,
    h: int,
    w: int,
    hwp: int,
    wp: int,
    n_pack: int,
    dilate_steps: int,
    scan_after: int,
    max_iters: int,
    carry_every: int,
    export_only: bool,
    frame_idx,
):
    """The megakernel's last-block tail, shared by the single-frame kernel
    and the batched kernel (one frame per grid row): zero the guard rows
    past the packed words, run the phase-1 dilation rounds, record flags,
    then emit the edge map / export the packed planes per the static
    mode. ``flags_row``/``frame_idx``/``fout_dst`` carry the batch
    indexing; ``n_pack`` is the word-row count the packs covered (the
    batched planes are 8-row padded, so guard rows may exceed one)."""
    f_ref[n_pack:, :] = jnp.zeros((hwp - n_pack, wp), jnp.uint32)
    p_ref[n_pack:, :] = jnp.zeros((hwp - n_pack, wp), jnp.uint32)

    # Schedule extents are the LOGICAL frame dims (hysteresis_fused's
    # log_h/log_w argument), so cadence matches every other backend.
    dilates, _ = bitpack._make_ops(
        h, w, dilate_steps, carry_every=carry_every,
        shifts=hfz._make_pl_shifts(hwp, wp),
    )
    p = p_ref[:, :]

    def round1(carry):
        it, _ = carry
        f = f_ref[:, :]
        nf = dilates(f, p)
        f_ref[:, :] = nf
        return it + 1, jnp.max((nf != f).astype(jnp.int32))

    # Identical counting to bitpack.hysteresis_packed's phase 1: one
    # unconditional round (the reference always launches once before
    # reading its flag, cannyEdgeH.cu:313), then rounds while growing,
    # to min(scan_after, max_iters). flags[row,1] == 1 on exit means the
    # frame needs phase 2 — the caller's cond owns it (module docstring).
    cap1 = min(scan_after, max_iters)
    it, changed = round1((jnp.int32(0), jnp.int32(0)))
    it, changed = jax.lax.while_loop(
        lambda c: (c[1] == 1) & (c[0] < cap1), round1, (it, changed)
    )
    flags_ref[flags_row, 0] = it
    flags_ref[flags_row, 1] = changed

    def export():
        cp_f = pltpu.make_async_copy(f_ref, fout_dst, osems.at[0])
        cp_p = pltpu.make_async_copy(p_ref, pout_dst, osems.at[1])
        cp_f.start()
        cp_p.start()
        cp_f.wait()
        cp_p.wait()

    if export_only:
        # Sharded mode: the packed planes ARE the product (the collective
        # round loop carries them as state, parallel/packed_halo.py); the
        # edge map is unpacked only at global convergence by a separate
        # kernel. Always export.
        export()
    elif scan_after >= max_iters:
        # The cap IS phase 1 (cap1 == max_iters): the exit state is
        # always final — converged or cap-TRUNCATED, the same monotone
        # under-approximation every backend returns at this config
        # (docs/parity.md). Phase 2 is unreachable, so the export code
        # is statically elided and the edge map always emitted.
        _unpack_out(
            f_ref, outbuf, osems, out_hbm, h, w, n_pack,
            frame_idx=frame_idx,
        )
    else:
        # Converged (the overwhelmingly common case): emit the edge map.
        # A still-growing exit here implies it == scan_after < max_iters
        # — never the cap — so the continuation owns it.
        @pl.when(changed == 0)
        def _():
            _unpack_out(
                f_ref, outbuf, osems, out_hbm, h, w, n_pack,
                frame_idx=frame_idx,
            )

        # Still growing at the phase boundary: skip the (wasted) unpack
        # and export the packed state + round count for the phase-2
        # continuation instead (module docstring). The edge-map output
        # is left unwritten — the caller's cond discards it.
        @pl.when(changed == 1)
        def _():
            export()


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "grad_coeff", "norm", "parity",
        "dilate_steps", "scan_after", "max_iters", "carry_every",
        "block_h", "interpret",
    ),
)
def canny_mega(
    frame_planar: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    kernel_size: int = 5,
    grad_coeff: int = 4,
    norm: str = "l2",
    parity: str = "reference",
    dilate_steps: int = 16,
    scan_after: int = 10,
    max_iters: int = 100,
    carry_every: int = bitpack._CARRY_EVERY,
    block_h: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(edge_map (H, W) u8, flags (1, 2) i32, packed FINAL plane, packed
    CANDIDATE plane) for a (3, H, W) planar BGR frame OR a (H, W)
    grayscale frame (channels=1 config — same kernel, channel-free
    ingest) — MONO through phase-1 hysteresis in one kernel launch.
    Callers check :func:`mega_ok` first and MUST handle flags[0, 1] == 1
    (still growing at the phase boundary: the edge map is UNWRITTEN and
    the packed planes carry the in-progress state for :func:`_cont_call`
    — see :func:`canny_mega_pipeline`, the composition users run; when
    converged, the planes are unwritten instead). ``block_h`` overrides
    the slab height for probing (tools/mega_probe.py)."""
    h, w = frame_planar.shape[-2:]
    gray = frame_planar.ndim == 2
    geo = _mega_geometry(h, w)
    assert geo is not None, "caller must check mega_ok()"
    bh, n_blocks, hwp, wp = geo
    if block_h is not None:
        assert block_h % 32 == 0
        bh = block_h
        n_blocks = -(-h // bh)
        hwp = n_blocks * (bh // 32) + 1
    return _mega_call(
        frame_planar, low, high, None,
        bh=bh, n_blocks=n_blocks, hwp=hwp, wp=wp, h=h, w=w,
        img_h=h, img_w=w, ring=(0, 0), use_origin=False, export_only=False,
        kernel_size=kernel_size, grad_coeff=grad_coeff, norm=norm,
        parity=parity, dilate_steps=dilate_steps, scan_after=scan_after,
        max_iters=max_iters, carry_every=carry_every, interpret=interpret,
    )


def _mega_call(
    frame_planar,
    low,
    high,
    origin,
    *,
    bh: int,
    n_blocks: int,
    hwp: int,
    wp: int,
    h: int,
    w: int,
    img_h: int,
    img_w: int,
    ring: Tuple[int, int],
    use_origin: bool,
    export_only: bool,
    kernel_size: int,
    grad_coeff: int,
    norm: str,
    parity: str,
    dilate_steps: int,
    scan_after: int,
    max_iters: int,
    carry_every: int,
    interpret: bool,
):
    gray = frame_planar.ndim == 2
    sw = ff._slab_w(w)
    # Export mode never unpacks: shrink the (otherwise unused) output
    # staging buffer to its minimum. 8K-class planes (4.3 MB each) put
    # the whole working set at ~73 MB — past the 64 MB cap the smaller
    # geometries use but comfortably inside v5e's 128 MB physical VMEM;
    # measured OOM-by-4.7MB at 64 MB, compiles at 100 MB.
    big = hwp * wp * 4 > hfz._PLANE_BUDGET
    vmem_cap = (100 if big else 64) * 1024 * 1024
    ch_rows = 8 if export_only else (64 if big else 128)
    slab_shape = (
        (2, bh + 2 * ff.PAD_R, sw) if gray
        else (2, 3, bh + 2 * ff.PAD_R, sw)
    )
    kern = functools.partial(
        _kernel,
        bh=bh, n_blocks=n_blocks, hwp=hwp, wp=wp, h=h, w=w,
        img_h=img_h, img_w=img_w, ring=ring, use_origin=use_origin,
        export_only=export_only,
        kernel_size=kernel_size, grad_coeff=grad_coeff, norm=norm,
        parity=parity, dilate_steps=dilate_steps, scan_after=scan_after,
        max_iters=max_iters, carry_every=carry_every,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # low, high, origin
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM(slab_shape, jnp.uint8),
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.VMEM((2, ch_rows, w), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if origin is None:
        origin_arr = jnp.zeros((2,), jnp.int32)
    else:
        origin_arr = jnp.stack([
            jnp.asarray(origin[0], jnp.int32),
            jnp.asarray(origin[1], jnp.int32),
        ])
    out, flags, fpack, ppack = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8 if export_only else h, w), jnp.uint8),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
            jax.ShapeDtypeStruct((hwp, wp), jnp.uint32),
            jax.ShapeDtypeStruct((hwp, wp), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_cap,
            has_side_effects=True,  # the output leaves via manual DMA
        ),
        interpret=interpret,
    )(
        jnp.asarray(low, jnp.int32).reshape(1),
        jnp.asarray(high, jnp.int32).reshape(1),
        origin_arr,
        frame_planar,
    )
    return out, flags, fpack, ppack


def mega_export_geometry(ext_h: int, ext_w: int):
    """(bh, n_blocks, hwp, wp) for the sharded export-mode megakernel on
    an extended (ext_h, ext_w) tile, or None when the tile is out of
    budget or off-granule (callers fall back to the XLA packed path)."""
    return _mega_geometry(ext_h, ext_w)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "grad_coeff", "norm", "parity", "dilate_steps",
        "scan_after", "max_iters", "ring", "image_size", "interpret",
    ),
)
def canny_mega_export(
    frame_ext: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    origin,
    image_size: Tuple[int, int],
    ring: Tuple[int, int],
    kernel_size: int = 5,
    grad_coeff: int = 4,
    norm: str = "l2",
    parity: str = "reference",
    dilate_steps: int = 16,
    scan_after: int = 10,
    max_iters: int = 100,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sharded-tile megakernel: raw halo-EXTENDED planar BGR (3, Eh, Ew)
    (or grayscale (Eh, Ew)) tile in — packed (FINAL, CANDIDATE) planes +
    phase-1 flags out, in ONE launch. The feed-forward chain, the
    threshold pack (with the pollution ring of width ``ring`` zeroed and
    zero-padding pinned to the global image via ``origin``/``image_size``)
    and the phase-1 dilation rounds to the LOCAL fixed point all run
    in-kernel; nothing is unpacked — the planes are the collective round
    loop's carried state (parallel/packed_halo.py). Returns
    (fpack, ppack, flags); flags[0, 1] == 1 means the local phase-1 budget
    truncated before the local fixed point (the loop's still-growing
    input). Replaces, for the sharded path, the reference's per-tile
    shared-memory iteration + host relaunch + halo reload through global
    memory (cannyEdgeD.cu:295-377; cannyEdgeH.cu:297-338)."""
    eh, ew = frame_ext.shape[-2:]
    geo = _mega_geometry(eh, ew)
    assert geo is not None, "caller must check mega_export_geometry()"
    bh, n_blocks, hwp, wp = geo
    _, flags, fpack, ppack = _mega_call(
        frame_ext, low, high, origin,
        bh=bh, n_blocks=n_blocks, hwp=hwp, wp=wp, h=eh, w=ew,
        img_h=image_size[0], img_w=image_size[1], ring=ring,
        use_origin=origin is not None, export_only=True,
        kernel_size=kernel_size, grad_coeff=grad_coeff, norm=norm,
        parity=parity, dilate_steps=dilate_steps, scan_after=scan_after,
        max_iters=max_iters, carry_every=bitpack._CARRY_EVERY,
        interpret=interpret,
    )
    return fpack, ppack, flags


def _unpack_core_kernel(
    f_hbm,
    out_hbm,
    f_ref,
    outbuf,
    sems,
    osems,
    *,
    hwp: int,
    wp: int,
    e_top: int,
    e_left: int,
    h_loc: int,
    w_loc: int,
):
    cp = pltpu.make_async_copy(f_hbm, f_ref, sems.at[0])
    cp.start()
    cp.wait()
    shifts = hfz._make_pl_shifts(hwp, wp)
    f = shifts[1](f_ref[:, :], -e_top)  # core row 0 -> bit 0
    if e_left:
        f = pltpu.roll(f, wp - e_left, 1)  # core col 0 -> lane 0
    f_ref[:, :] = f
    # Emit on the DMA granules (h_loc/w_loc are arbitrary for sharded
    # tiles); rows/lanes past the core carry halo state and are sliced
    # off by the caller.
    _unpack_out(
        f_ref, outbuf, osems, out_hbm, out_hbm.shape[0], out_hbm.shape[1],
        min(-(-out_hbm.shape[0] // 32), hwp),
    )


@functools.partial(
    jax.jit,
    static_argnames=("e_top", "e_left", "h_loc", "w_loc", "interpret"),
)
def unpack_core_call(
    fpack: jnp.ndarray,
    e_top: int,
    e_left: int,
    h_loc: int,
    w_loc: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Unpack the owned core of a converged extended-grid FINAL plane into
    the final (h_loc, w_loc) uint8 edge map (FINAL where the bit is set,
    NO_EDGE otherwise — removeCandidates semantics, cannyEdgeD.cu:379-395,
    are inherent to the packed representation). One small kernel: bit-align
    the core (one packed-pixel shift + one lane roll), then the shared
    unpack + manual output DMA."""
    hwp, wp = fpack.shape
    # Granule-padded emission (8-row DMA chunks, 128-lane rows); rows and
    # lanes past the core hold halo state — sliced off below.
    h_pad = ((h_loc + 7) // 8) * 8
    w_pad = min(((w_loc + 127) // 128) * 128, wp)
    ch_rows = 128 if h_pad > 128 else ((h_pad + 31) // 32) * 32
    kern = functools.partial(
        _unpack_core_kernel,
        hwp=hwp, wp=wp, e_top=e_top, e_left=e_left,
        h_loc=h_loc, w_loc=w_loc,
    )
    (out,) = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((h_pad, w_pad), jnp.uint8)],
        scratch_shapes=[
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.VMEM((2, ch_rows, w_pad), jnp.uint8),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
            has_side_effects=True,  # the output leaves via manual DMA
        ),
        interpret=interpret,
    )(fpack)
    return out[:h_loc, :w_loc]


def _cont_kernel(
    it_ref,
    f_hbm,
    p_hbm,
    out_hbm,
    flags_ref,
    f_ref,
    p_ref,
    outbuf,
    sems,
    osems,
    *,
    h: int,
    w: int,
    hwp: int,
    wp: int,
    dilate_steps: int,
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
        h, w, dilate_steps, carry_every=carry_every,
        shifts=hfz._make_pl_shifts(hwp, wp),
    )
    p = p_ref[:, :]

    def round2(carry):
        it, _ = carry
        f = f_ref[:, :]
        nf = scans(dilates(f, p), p)
        f_ref[:, :] = nf
        return it + 1, jnp.max((nf != f).astype(jnp.int32))

    # Exactly bitpack.hysteresis_packed's phase-2 while_loop, resumed at
    # the imported round count: this kernel only ever runs when phase 1
    # exited still-growing, so the initial changed is 1 by construction.
    it, changed = jax.lax.while_loop(
        lambda c: (c[1] == 1) & (c[0] < max_iters),
        round2,
        (it_ref[0], jnp.int32(1)),
    )
    flags_ref[0, 0] = it
    flags_ref[0, 1] = changed
    _unpack_out(f_ref, outbuf, osems, out_hbm, h, w, hwp - 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "hwp", "wp", "dilate_steps", "max_iters", "carry_every",
        "interpret",
    ),
)
def _cont_call(
    fpack: jnp.ndarray,
    ppack: jnp.ndarray,
    it0: jnp.ndarray,
    h: int,
    w: int,
    hwp: int,
    wp: int,
    dilate_steps: int,
    max_iters: int,
    carry_every: int = bitpack._CARRY_EVERY,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phase-2 continuation: resume convergence on the packed state
    :func:`canny_mega` exported (escalated rounds — dilations + the
    8-direction carry-lookahead scans — to the cap), then unpack the edge
    map. ``it0`` is the (1,) round count where phase 1 stopped. Returns
    (edge_map, flags)."""
    ch_rows = 128 if h > 128 else ((h + 31) // 32) * 32
    kern = functools.partial(
        _cont_kernel,
        h=h, w=w, hwp=hwp, wp=wp, dilate_steps=dilate_steps,
        max_iters=max_iters, carry_every=carry_every,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # it0
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.VMEM((2, ch_rows, w), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, flags = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.uint8),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
            has_side_effects=True,  # the output leaves via manual DMA
        ),
        interpret=interpret,
    )(jnp.asarray(it0, jnp.int32).reshape(1), fpack, ppack)
    return out, flags


def _cont_xla(
    fpack: jnp.ndarray,
    ppack: jnp.ndarray,
    it0: jnp.ndarray,
    h: int,
    w: int,
    dilate_steps: int,
    max_iters: int,
    carry_every: int = bitpack._CARRY_EVERY,
) -> jnp.ndarray:
    """Phase-2 continuation as plain XLA ops — same contract as
    :func:`_cont_call`, directly on the exported guard-ringed planes.

    bitpack's canonical pad/slice shift primitives already operate on this
    exact layout (row-packed words major, image columns minor); the guard
    word-row and lanes are zero in both planes and absorbing, so zero-fill
    shifts over the (hwp, wp) extent behave identically to the logical
    (ceil(h/32), w) extent — the factory's schedule does the rest.

    Why this exists alongside the Pallas continuation: an UNTAKEN cond
    branch holding a second Mosaic kernel still costs ~12 us of device
    time at 1080p (binary-presence tax, tools/mega_probe.py); an untaken
    XLA branch costs nothing. Small frames — where phase 2 is rare and
    12 us is 10% of the frame — route here; mega-frames keep the Pallas
    continuation (phase 2 is scene-typical there and runs ~2x faster than
    this XLA form)."""
    dilates, scans = bitpack._make_ops(
        h, w, dilate_steps, carry_every=carry_every
    )

    def round2(carry):
        it, f, _ = carry
        nf = scans(dilates(f, ppack), ppack)
        return it + 1, nf, jnp.max((nf != f).astype(jnp.int32))

    _, f, _ = jax.lax.while_loop(
        lambda c: (c[2] == 1) & (c[0] < max_iters),
        round2,
        (it0, fpack, jnp.int32(1)),
    )
    return jnp.where(
        bitpack.unpack_mask(f[:, :w], h),
        np.uint8(FINAL_EDGE),
        np.uint8(0),
    )


#: Pixel count at which the pipeline's phase-2 continuation switches from
#: the XLA form to the Pallas kernel (see _cont_xla's docstring): 4K and
#: up — but only while the continuation KERNEL is compilable at the shape
#: (its 8-direction scans at 8K never returned from the remote Mosaic
#: compiler; the auto policy routes those to the SPLIT form below).
_CONT_PALLAS_MIN_PX = 4_000_000

#: Column-split continuation constants (the 8K class — plane past the
#: monolithic scan kernel's budget): largest per-slice plane the remote
#: Mosaic compiler is PROVEN to handle (the 8K half-plane, 2.23 MB,
#: compiled and ran — tools/split8k_probe.py), and the per-launch
#: internal round chunk of the total-round-budget accounting
#: (converge_packed_split's docstring; unchunked, a cap-class input
#: costs max_iters^2 rounds — measured 190 ms vs the XLA form's 35).
_SPLIT_SLICE_BUDGET = 2_400_000
_SPLIT_CHUNK = 8


def _cont_split(
    fpack: jnp.ndarray,
    ppack: jnp.ndarray,
    it0: jnp.ndarray,
    h: int,
    w: int,
    dilate_steps: int,
    max_iters: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Phase-2 continuation for plane shapes whose monolithic scan kernel
    does not compile (8K): column-split convergence with seam-halo
    rounds (hysteresis_fused.converge_packed_split) at 4K-class slice
    shapes, resuming the round BUDGET at ``it0``, then the 2-us unpack
    kernel. In-kernel rounds are ~50x cheaper than the XLA
    continuation's HBM rounds; measured on the 8K cap-class state:
    35 ms (XLA) -> see BENCH_TABLE's escalation row. Multi-tile
    executor: converged-identity only (docs/parity.md carve-out)."""
    from cudacam_tpu.ops.pallas.hysteresis_fused import (
        converge_packed_split,
    )

    hwp, wp = fpack.shape
    n_split = 2
    while (
        w % n_split == 0
        and hwp * (w // n_split + 256) * 4 > _SPLIT_SLICE_BUDGET
    ):
        n_split *= 2
    f, _ = converge_packed_split(
        fpack, ppack, h, w, n_split,
        dilate_steps=dilate_steps, scan_after=0, max_iters=max_iters,
        chunk=_SPLIT_CHUNK, it0=it0, interpret=interpret,
    )
    return unpack_core_call(f, 0, 0, h, w, interpret=interpret)


def _kernel_batched(
    lo_ref,
    hi_ref,
    frame_hbm,
    out_hbm,
    flags_ref,
    fout_hbm,
    pout_hbm,
    slab,
    f_ref,
    p_ref,
    outbuf,
    sems,
    osems,
    *,
    bh: int,
    n_blocks: int,
    hwp: int,
    wp: int,
    h: int,
    w: int,
    n_batch: int,
    kernel_size: int,
    grad_coeff: int,
    norm: str,
    parity: str,
    dilate_steps: int,
    scan_after: int,
    max_iters: int,
    carry_every: int,
):
    """The megakernel's batch form: grid (B, n_blocks), ONE launch for the
    whole multi-camera batch — frames run back-to-back on the RESIDENT
    scratch (the sweep_fused pattern over frames instead of threshold
    pairs), eliminating lax.map's ~16 us/frame dispatch overhead
    (engine._map_batch's r4 measurement). Per frame the body IS _kernel's
    unsharded path (origin/ring static zeros; every f_ref/p_ref word row
    is overwritten by the frame's own packs, so state reuse across frames
    needs no reset); flags, the edge map, and — for still-growing frames —
    the exported planes land at the frame's batch index."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    _ingest_chain_pack(
        frame_hbm, slab, sems, f_ref, p_ref, i, lo_ref[0], hi_ref[0],
        jnp.int32(0), jnp.int32(0),
        bh=bh, n_blocks=n_blocks, hwp=hwp, wp=wp, h=h, w=w,
        img_h=h, img_w=w, ring=(0, 0),
        kernel_size=kernel_size, grad_coeff=grad_coeff, norm=norm,
        parity=parity, batch_idx=b, n_batch=n_batch,
    )

    n_pack = n_blocks * (bh // 32)  # word rows the packs cover; rest is guard

    @pl.when(i == n_blocks - 1)
    def _():
        _phase1_finalize(
            f_ref, p_ref, outbuf, osems, out_hbm,
            fout_hbm.at[b], pout_hbm.at[b], flags_ref, b,
            h=h, w=w, hwp=hwp, wp=wp, n_pack=n_pack,
            dilate_steps=dilate_steps, scan_after=scan_after,
            max_iters=max_iters, carry_every=carry_every,
            export_only=False, frame_idx=b,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "grad_coeff", "norm", "parity",
        "dilate_steps", "scan_after", "max_iters", "carry_every",
        "block_h", "interpret",
    ),
)
def canny_mega_batched(
    frames_planar: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    kernel_size: int = 5,
    grad_coeff: int = 4,
    norm: str = "l2",
    parity: str = "reference",
    dilate_steps: int = 16,
    scan_after: int = 10,
    max_iters: int = 100,
    carry_every: int = bitpack._CARRY_EVERY,
    block_h: Optional[int] = None,
    interpret: bool = False,
):
    """(edge (B,H,W), flags (B,2), fpack (B,hwp,wp), ppack (B,hwp,wp)) for
    a (B, 3, H, W) planar BGR batch (or (B, H, W) grayscale) — the whole
    multi-camera batch in ONE kernel launch (see _kernel_batched). Frames
    still growing at the phase boundary export their planes for the
    per-frame continuation (canny_mega_pipeline_batched)."""
    h, w = frames_planar.shape[-2:]
    n_b = frames_planar.shape[0]
    geo = _mega_geometry(h, w)
    assert geo is not None, "caller must check mega_ok()"
    bh, n_blocks, hwp, wp = geo
    if block_h is not None:
        # Test hook (canny_mega's contract): force multi-block geometry
        # at small shapes so the per-block predicated packs, the global
        # slot cycle, and the cross-frame prefetch all execute.
        assert block_h % 32 == 0
        bh = block_h
        n_blocks = -(-h // bh)
        hwp = n_blocks * (bh // 32) + 1
    # Mosaic requires sliced DMA row counts to be 8-aligned: the per-frame
    # plane export copies f_ref -> fout[b], so the batched planes carry
    # extra PERMANENT-ZERO guard word-rows up to the 8-row granule
    # (semantically free — guard rows hold zeros forever; the roll wraps
    # see only zeros, and the continuations ignore rows past ceil(h/32)).
    hwp = -(-hwp // 8) * 8
    gray = frames_planar.ndim == 3
    sw = ff._slab_w(w)
    big = hwp * wp * 4 > hfz._PLANE_BUDGET
    vmem_cap = (100 if big else 64) * 1024 * 1024
    ch_rows = 64 if big else 128
    slab_shape = (
        (2, bh + 2 * ff.PAD_R, sw) if gray
        else (2, 3, bh + 2 * ff.PAD_R, sw)
    )
    kern = functools.partial(
        _kernel_batched,
        bh=bh, n_blocks=n_blocks, hwp=hwp, wp=wp, h=h, w=w, n_batch=n_b,
        kernel_size=kernel_size, grad_coeff=grad_coeff, norm=norm,
        parity=parity, dilate_steps=dilate_steps, scan_after=scan_after,
        max_iters=max_iters, carry_every=carry_every,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # low, high
        grid=(n_b, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            # Full-array SMEM (B, 2): a BLOCKED SMEM out spec fails the
            # TPU lowering's last-two-dims divisibility check; the kernel
            # indexes row b directly.
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM(slab_shape, jnp.uint8),
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.VMEM((hwp, wp), jnp.uint32),
            pltpu.VMEM((2, ch_rows, w), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, flags, fpack, ppack = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_b, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n_b, 2), jnp.int32),
            jax.ShapeDtypeStruct((n_b, hwp, wp), jnp.uint32),
            jax.ShapeDtypeStruct((n_b, hwp, wp), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_cap,
            has_side_effects=True,  # outputs leave via manual DMA
        ),
        interpret=interpret,
    )(
        jnp.asarray(low, jnp.int32).reshape(1),
        jnp.asarray(high, jnp.int32).reshape(1),
        frames_planar,
    )
    return out, flags, fpack, ppack


def canny_mega_pipeline_batched(
    frames_planar: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    kernel_size: int = 5,
    grad_coeff: int = 4,
    norm: str = "l2",
    parity: str = "reference",
    dilate_steps: int = 16,
    scan_after: int = 10,
    max_iters: int = 100,
    cont: str = "auto",
    block_h: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched production pipeline: ONE megakernel launch for the whole
    (B, ...) batch, then a per-frame phase-2 continuation cond (rarely
    taken — the derived scan_after defaults cover every measured scene).
    Bit-identical per frame to canny_mega_pipeline (same schedule, same
    phase split)."""
    if cont not in ("auto", "pallas", "xla", "split"):
        raise ValueError(f"cont must be auto|pallas|xla|split, got {cont!r}")
    edge, flags, fpack, ppack = canny_mega_batched(
        frames_planar, low, high,
        kernel_size=kernel_size, grad_coeff=grad_coeff, norm=norm,
        parity=parity, dilate_steps=dilate_steps, scan_after=scan_after,
        max_iters=max_iters, block_h=block_h, interpret=interpret,
    )
    if scan_after >= max_iters:
        return edge
    h, w = frames_planar.shape[-2:]
    _, _, hwp, wp = _mega_geometry(h, w)
    if block_h is not None:
        n_bl = -(-h // block_h)
        hwp = n_bl * (block_h // 32) + 1
    # Policy from the UNPADDED geometry (identical form choice to the
    # single-frame pipeline — a review catch: boundary shapes must not
    # pick a different continuation batched vs single); the continuation
    # KERNEL shapes use the batched kernel's 8-row-padded planes.
    cont = _resolve_cont(cont, h, w, hwp, wp)
    hwp = -(-hwp // 8) * 8

    def tail(args):
        edge_b, f_b, p_b, fl = args

        def _continue(ops):
            f, p, it0 = ops
            if cont == "pallas":
                out, _ = _cont_call(
                    f, p, it0, h=h, w=w, hwp=hwp, wp=wp,
                    dilate_steps=dilate_steps, max_iters=max_iters,
                    interpret=interpret,
                )
                return out
            if cont == "split":
                return _cont_split(
                    f, p, it0[0], h=h, w=w,
                    dilate_steps=dilate_steps, max_iters=max_iters,
                    interpret=interpret,
                )
            return _cont_xla(
                f, p, it0[0], h=h, w=w,
                dilate_steps=dilate_steps, max_iters=max_iters,
            )

        return jax.lax.cond(
            fl[1] == 1, _continue, lambda ops: edge_b, (f_b, p_b, fl[:1])
        )

    # Outer gate: when NO frame escalated (the common case — the derived
    # scan_after covers every measured scene), skip the per-frame map
    # entirely; an untaken XLA branch costs nothing.
    return jax.lax.cond(
        jnp.any(flags[:, 1] == 1),
        lambda args: jax.lax.map(tail, args),
        lambda args: args[0],
        (edge, fpack, ppack, flags),
    )


def _resolve_cont(cont: str, h: int, w: int, hwp: int, wp: int) -> str:
    """The static continuation-form policy (unit-tested without tracing):
    'auto' → XLA at small frames (untaken Mosaic branch costs ~12 us),
    the Pallas kernel at 4K class, the column-split form where the
    monolithic scan kernel cannot compile (8K class); a forced 'pallas'
    at an uncompilable shape warns and falls back to 'split'."""
    past_budget = hwp * wp * 4 > hfz._PLANE_BUDGET
    if cont == "auto":
        if past_budget:
            # 8K class: the monolithic scan kernel never compiles; the
            # column-split form runs 4K-class slices in-kernel (cap-class
            # 8K state: 34.8 ms XLA -> 17.3 split;
            # tools/split8k_chunked_probe.py).
            return "split" if w % 2 == 0 else "xla"
        return "pallas" if h * w >= _CONT_PALLAS_MIN_PX else "xla"
    if cont == "pallas" and past_budget:
        # Forced Pallas at a shape whose 8-direction scan kernel does not
        # compile (8K class: the remote Mosaic compiler never returns on
        # it — docs/performance.md). Fall back rather than hang a compile.
        import warnings

        warnings.warn(
            f"continuation='pallas' unavailable at {h}x{w} (scan kernel "
            "past the compilable plane budget); using the split form",
            stacklevel=2,
        )
        return "split" if w % 2 == 0 else "xla"
    return cont


def canny_mega_pipeline(
    frame_planar: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    kernel_size: int = 5,
    grad_coeff: int = 4,
    norm: str = "l2",
    parity: str = "reference",
    dilate_steps: int = 16,
    scan_after: int = 10,
    max_iters: int = 100,
    cont: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """The production single-launch pipeline: :func:`canny_mega` plus the
    phase-2 continuation for frames still growing at the phase boundary.
    Bit-identical to the two-kernel path for every input (the two launches
    execute bitpack.hysteresis_packed's two phases on the same state;
    module docstring). ``cont`` picks the continuation implementation:
    "auto" (size policy, _CONT_PALLAS_MIN_PX), "pallas", or "xla"."""
    if cont not in ("auto", "pallas", "xla", "split"):
        raise ValueError(f"cont must be auto|pallas|xla|split, got {cont!r}")
    edge, flags, fpack, ppack = canny_mega(
        frame_planar, low, high,
        kernel_size=kernel_size, grad_coeff=grad_coeff, norm=norm,
        parity=parity, dilate_steps=dilate_steps, scan_after=scan_after,
        max_iters=max_iters, interpret=interpret,
    )
    if scan_after >= max_iters:
        # Phase 2 statically unreachable: the cap IS phase 1, and the
        # kernel emits the (possibly cap-truncated) edge map
        # unconditionally at this config.
        return edge
    h, w = frame_planar.shape[-2:]
    _, _, hwp, wp = _mega_geometry(h, w)
    cont = _resolve_cont(cont, h, w, hwp, wp)

    if cont == "pallas":

        def _continue(ops):
            f, p, it0 = ops
            out, _ = _cont_call(
                f, p, it0, h=h, w=w, hwp=hwp, wp=wp,
                dilate_steps=dilate_steps, max_iters=max_iters,
                interpret=interpret,
            )
            return out

    elif cont == "split":

        def _continue(ops):
            f, p, it0 = ops
            return _cont_split(
                f, p, it0[0], h=h, w=w,
                dilate_steps=dilate_steps, max_iters=max_iters,
                interpret=interpret,
            )

    else:

        def _continue(ops):
            f, p, it0 = ops
            return _cont_xla(
                f, p, it0[0], h=h, w=w,
                dilate_steps=dilate_steps, max_iters=max_iters,
            )

    return jax.lax.cond(
        flags[0, 1] == 1,
        _continue,
        lambda ops: edge,
        (fpack, ppack, flags[:1, 0]),
    )
