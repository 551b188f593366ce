"""Edge-tracking hysteresis as a Pallas TPU sweep kernel.

The reference's hysteresis (cannyEdgeD.cu:295-377) iterates each 32x32 CUDA
block to a local fixed point in shared memory, then has the HOST re-launch the
kernel — with a device->host flag readback per iteration — until no block
changes (cannyEdgeH.cu:297-338, capped at 100 relaunches).

TPU-native replacement, exploiting that a Pallas grid executes sequentially
on the core:

* the frame is cut into full-width row slabs; each grid step DMAs its slab
  plus one halo row from HBM, promotes candidates (128) 8-connected to FINAL
  edges (255) to a *local fixed point* entirely in VMEM, then writes the slab
  back in place (``input_output_aliases``);
* because steps run in order, a down sweep lets edges propagate through the
  whole frame top-to-bottom in ONE kernel launch (the reference needs one
  host relaunch per 30 rows of travel); an up sweep covers the other
  direction;
* a per-sweep "changed" scalar is accumulated in SMEM and returned, and an
  on-device ``lax.while_loop`` runs down+up sweep pairs until a pair changes
  nothing — zero host round trips, unlike the reference's per-iteration
  cudaMemcpy flag readback (cannyEdgeH.cu:310,322).

The result is the exact global fixed point (promotion is monotone, so sweep
order only affects speed, not the result), bit-identical to the oracle's BFS
(numpy_oracle.hysteresis).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudacam_tpu.ops.pallas.feedforward import _pick_block_h
from cudacam_tpu.stages import CANDIDATE_EDGE, FINAL_EDGE, NO_EDGE

#: Halo rows exchanged per sweep, sized to the 8-sublane VMEM tiling so
#: every memref slice stays aligned.
HALO = 8


def _make_dilate8(shape):
    """Build an in-kernel 8-neighborhood OR (zero fill at the tile edge) over
    int32 0/1 planes of ``shape``. Shifts are ``pltpu.roll`` (native circular
    lane/sublane rotates) with the wrapped row/col masked off — Mosaic has no
    efficient lowering for pad+slice shifts inside kernels."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    not_first_r = (rows > 0).astype(jnp.int32)
    not_last_r = (rows < shape[0] - 1).astype(jnp.int32)
    not_first_c = (cols > 0).astype(jnp.int32)
    not_last_c = (cols < shape[1] - 1).astype(jnp.int32)

    def dilate8(f: jnp.ndarray) -> jnp.ndarray:
        # out[r] |= f[r-1]: roll down by 1, wrapped row 0 masked (and the
        # mirror image; pltpu.roll takes non-negative shifts only).
        vert = (
            f
            | (pltpu.roll(f, 1, 0) & not_first_r)
            | (pltpu.roll(f, shape[0] - 1, 0) & not_last_r)
        )
        return (
            vert
            | (pltpu.roll(vert, 1, 1) & not_first_c)
            | (pltpu.roll(vert, shape[1] - 1, 1) & not_last_c)
        )

    return dilate8


def _sweep_kernel(
    state_hbm,
    out_hbm,
    changed_ref,
    tile,
    sems,
    *,
    bh: int,
    width: int,
    n_blocks: int,
    down: bool,
    max_local_iters: int,
):
    j = pl.program_id(0)
    b = j if down else n_blocks - 1 - j

    @pl.when(j == 0)
    def _():
        changed_ref[0] = 0

    # Slab + HALO rows each side (8, keeping every VMEM memref slice aligned
    # to the 8-sublane tiling); the state array is row-padded by HALO, so
    # [b*bh, b*bh + bh + 2*HALO) is always in range. Reading from out_hbm
    # (the aliased, already-updated buffer) is what lets a sweep carry edges
    # across slab boundaries within a single launch.
    read = pltpu.make_async_copy(
        out_hbm.at[pl.ds(b * bh, bh + 2 * HALO), :], tile, sems.at[0]
    )
    read.start()
    read.wait()

    t32 = tile[:, :].astype(jnp.int32)
    final = (t32 == FINAL_EDGE).astype(jnp.int32)
    cand = (t32 == CANDIDATE_EDGE).astype(jnp.int32)
    dilate8 = _make_dilate8(t32.shape)
    n0 = jnp.sum(final)

    # Local fixed point in VMEM (the reference's in-block while loop,
    # cannyEdgeD.cu:333-366, lifted to a full-width slab). Convergence is
    # count-based — promotion is monotone, so the FINAL count strictly grows
    # until the fixed point (i1-vector reductions don't lower on Mosaic).
    def cond(s):
        _, prev, cur, it = s
        return (cur > prev) & (it < max_local_iters)

    def body(s):
        f, _, cur, it = s
        nf = f | (cand & dilate8(f))
        return nf, cur, jnp.sum(nf), it + 1

    reached, _, n_reached, _ = jax.lax.while_loop(
        cond, body, (final, jnp.int32(-1), n0, jnp.int32(0))
    )

    changed_ref[0] += (n_reached > n0).astype(jnp.int32)
    new_t = jnp.maximum(t32, reached * FINAL_EDGE).astype(jnp.uint8)

    # Write back the FULL tile, halo rows included. Promotion is monotone
    # toward the one global fixed point, so promotions computed in halo rows
    # (which overlap the neighbor slab's interior) are always sound — and
    # writing them back both avoids unaligned VMEM slices and feeds the next
    # slab's read extra already-propagated state.
    tile[:, :] = new_t
    write = pltpu.make_async_copy(
        tile, out_hbm.at[pl.ds(b * bh, bh + 2 * HALO)], sems.at[1]
    )
    write.start()
    write.wait()


def _make_sweep(hp: int, w: int, bh: int, down: bool, max_local_iters: int, interpret: bool):
    n_blocks = hp // bh
    kern = functools.partial(
        _sweep_kernel,
        bh=bh,
        width=w,
        n_blocks=n_blocks,
        down=down,
        max_local_iters=max_local_iters,
    )

    def sweep(state: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        out, changed = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((hp + 2 * HALO, w), jnp.uint8),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((bh + 2 * HALO, w), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(state)
        return out, changed[0]

    return sweep


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iters",
        "remove_candidates",
        "interpret",
        "block_h",
        "max_local_iters",
    ),
)
def hysteresis_pallas(
    thresh: jnp.ndarray,
    max_iters: int = 100,
    remove_candidates: bool = True,
    interpret: bool = False,
    block_h: Optional[int] = None,
    max_local_iters: int = 4096,
) -> jnp.ndarray:
    """Global hysteresis fixed point of a (H, W) uint8 threshold map.

    ``max_iters`` caps down+up sweep *pairs* (the reference's 100-relaunch
    safety belt, cannyEdgeH.cu:313; one sweep pair here covers at least as
    much propagation as ~H/30 reference relaunches).
    """
    h, w = thresh.shape
    wp = ((w + 127) // 128) * 128  # 128-lane DMA alignment
    # ~6 tile-shaped int32 arrays are live in the saturation loop.
    bh = block_h or _pick_block_h(h, wp * 4, 6, HALO)
    n_blocks = pl.cdiv(h, bh)
    hp = n_blocks * bh

    # Row-pad by HALO (DMA halo legality) + up to the slab grid; col-pad to
    # the 128-lane granule. Padded cells are NO_EDGE, which is absorbing:
    # they never promote and never change.
    state = jnp.pad(thresh, ((HALO, HALO + (hp - h)), (0, wp - w)))

    down = _make_sweep(hp, wp, bh, True, max_local_iters, interpret)
    up = _make_sweep(hp, wp, bh, False, max_local_iters, interpret)

    # Alternate single sweeps: every sweep locally saturates each
    # (halo-overlapped) slab, so ONE sweep with zero changes already proves
    # the global fixed point — no need to finish a down+up pair.
    state, changed = down(state)

    def cond(s):
        _, changed, it = s
        return (changed > 0) & (it < 2 * max_iters)

    def body(s):
        state, _, it = s
        state, changed = jax.lax.cond(it % 2 == 1, up, down, state)
        return state, changed, it + 1

    state, _, _ = jax.lax.while_loop(cond, body, (state, changed, jnp.int32(1)))

    out = state[HALO : HALO + h, :w]
    if remove_candidates:
        # removeCandidates (cannyEdgeD.cu:379-395): surviving 128s -> 0.
        return jnp.where(out == FINAL_EDGE, jnp.uint8(FINAL_EDGE), jnp.uint8(NO_EDGE))
    return out
