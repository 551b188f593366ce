"""Tile-sharded Canny over a device mesh with halo exchange.

This is the multi-chip generalisation of the reference's intra-GPU tiling
(32x32 shared-memory tiles with 1-2 halo cells, cannyEdgeD.cu:89,140,220,314)
and of its host-coordinated hysteresis relaunch loop (cannyEdgeH.cu:297-338):

- a mega-frame (or batch of camera frames) is partitioned over a
  (batch 'b', rows 'y', cols 'x') mesh;
- each stencil round extends the local tile with halo rows/cols fetched from
  neighbor shards via ``jax.lax.ppermute`` (ICI neighbor exchange; missing
  neighbors arrive as zeros, which IS the reference's zero-padding semantics,
  cannyEdgeD.cu:91-98);
- the whole mono->threshold chain runs on a once-extended tile (the total
  stencil halo is kernel_size//2 + 2), so there is ONE halo exchange for all
  feed-forward stages, not one per stage;
- hysteresis runs as a global ``lax.while_loop``: each round saturates the
  halo-extended tile to its LOCAL fixed point with an injectable operator
  (default: the bit-packed loop of ops/bitpack.py — the same implementation
  every single-chip backend runs), then reduces a convergence flag with
  ``psum`` over all mesh axes — the TPU-native replacement for the
  reference's per-iteration device->host flag readback
  (cannyEdgeH.cu:310,322). Collective rounds are bounded by the
  cross-shard edge diameter, not the pixel diameter.

Correctness note (pollution depth): running the zero-padding single-chip ops
on a tile extended by the *total* halo H yields exact values in the core,
because stage k's output at extended-row r is exact for r >= (sum of stage
halos up to k), which is <= H at the final pre-hysteresis stage.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from cudacam_tpu.config import CannyConfig
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.parallel.mesh import BATCH_AXIS, COL_AXIS, ROW_AXIS
from cudacam_tpu.stages import CANDIDATE_EDGE, FINAL_EDGE, NO_EDGE, CannyStage

shard_map = jax.shard_map


def _exchange_halo(x: jnp.ndarray, h: int, axis: int, axis_name: str, n: int) -> jnp.ndarray:
    """Extend local tile along ``axis`` with ``h`` rows/cols from both mesh
    neighbors on ``axis_name``. Boundary shards receive zeros (= the global
    zero padding of the reference's tile fill)."""
    if n == 1 or h == 0:
        # Single shard on this axis: zero-pad directly (global border).
        pad = [(0, 0)] * x.ndim
        pad[axis] = (h, h)
        return jnp.pad(x, pad)
    down = [(i, i + 1) for i in range(n - 1)]  # shard i -> i+1
    up = [(i + 1, i) for i in range(n - 1)]  # shard i+1 -> i

    def take(start: Optional[int], stop: Optional[int]) -> jnp.ndarray:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, stop)
        return x[tuple(idx)]

    top = jax.lax.ppermute(take(-h, None), axis_name, down)  # my top halo = upper neighbor's bottom
    bottom = jax.lax.ppermute(take(None, h), axis_name, up)  # my bottom halo = lower neighbor's top
    return jnp.concatenate([top, x, bottom], axis=axis)


def _trim(x: jnp.ndarray, h: int, axes: tuple[int, ...]) -> jnp.ndarray:
    idx = [slice(None)] * x.ndim
    for a in axes:
        idx[a] = slice(h, x.shape[a] - h)
    return x[tuple(idx)]


def default_local_saturate(cfg: CannyConfig) -> Callable:
    """The production local-saturation operator for sharded hysteresis: the
    bit-packed convergence loop (ops/bitpack.py) run to the LOCAL fixed
    point of the halo-extended tile, candidates preserved for the next
    exchange round. Pure jnp — identical code on CPU virtual meshes, a real
    TPU slice, and a multi-process pod."""
    from cudacam_tpu.ops.bitpack import hysteresis_packed

    def saturate(t_ext: jnp.ndarray) -> jnp.ndarray:
        return hysteresis_packed(
            t_ext,
            max_iters=cfg.max_hysteresis_iters,
            remove_candidates=False,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
        )

    return saturate


def fused_local_saturate(cfg: CannyConfig) -> Callable:
    """Local-saturation operator backed by the fused Pallas hysteresis
    kernel (ops/pallas/hysteresis_fused.py) — the pallas backend's default.
    The kernel pads halo-extended tiles to its DMA granules internally and
    runs the SAME round schedule as the packed loop, so swapping operators
    never changes the converged result (and matches truncation too)."""
    from cudacam_tpu.ops.pallas.hysteresis_fused import hysteresis_fused

    def saturate(t_ext: jnp.ndarray) -> jnp.ndarray:
        return hysteresis_fused(
            t_ext,
            max_iters=cfg.max_hysteresis_iters,
            remove_candidates=False,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
        )

    return saturate


def sweep_kernel_local_saturate(cfg: CannyConfig) -> Callable:
    """Alternative saturation operator: the Pallas sequential-sweep kernel
    (ops/pallas/hysteresis.py; real TPU only). Injectable via
    ``build_sharded_pipeline(..., local_saturate=...)`` — the round-loop
    composition around it is the same one the virtual-mesh tests execute
    with the packed/oracle stand-ins (tests/test_sharded.py)."""
    from cudacam_tpu.ops.pallas.hysteresis import hysteresis_pallas

    def saturate(t_ext: jnp.ndarray) -> jnp.ndarray:
        return hysteresis_pallas(
            t_ext, max_iters=cfg.max_hysteresis_iters, remove_candidates=False
        )

    return saturate


def build_sharded_pipeline(
    cfg: CannyConfig,
    mesh: Mesh,
    final_stage: CannyStage = CannyStage.HYSTER,
    hysteresis_halo: Optional[int] = None,
    backend: str = "xla",
    local_saturate: Optional[Callable] = None,
) -> Callable:
    """Return a jitted fn(frame, low, high) running the pipeline sharded over
    ``mesh``. ``frame`` is (B, H, W[, C]) uint8 with B % mesh('b') == 0,
    H % mesh('y') == 0, W % mesh('x') == 0.

    ``hysteresis_halo`` rows/cols of edge state are exchanged per convergence
    round (defaults to cfg.hysteresis_inner_steps so cross-shard propagation
    keeps pace with local propagation).

    ``backend='pallas'`` (real TPU meshes) runs each shard's local
    feed-forward through the fused Pallas kernel, consuming the
    halo-extended tile with its global origin pinned (so zero-padding
    applies at the GLOBAL image border). 'xla' is the portable default
    (virtual CPU meshes, the driver dry-run). Hysteresis uses the same
    round loop on both backends with ``local_saturate`` as the injectable
    local operator (default: default_local_saturate — bit-packed, portable;
    sweep_kernel_local_saturate is the Pallas-sweep alternative).
    """
    if backend not in ("xla", "pallas"):
        raise ValueError("backend must be 'xla' or 'pallas'")
    final_stage = CannyStage(final_stage)
    ny = mesh.shape[ROW_AXIS]
    nx = mesh.shape[COL_AXIS]
    if cfg.height % ny or cfg.width % nx:
        raise ValueError(
            f"frame {cfg.height}x{cfg.width} not divisible by mesh tiles {ny}x{nx}"
        )
    h_loc, w_loc = cfg.height // ny, cfg.width // nx
    halo = cfg.halo  # total feed-forward stencil halo
    if halo > min(h_loc, w_loc):
        raise ValueError(
            f"stencil halo {halo} exceeds local tile {h_loc}x{w_loc}; use fewer shards"
        )
    hh = hysteresis_halo if hysteresis_halo is not None else cfg.hysteresis_inner_steps
    # A shard can only export state it owns: cap the exchange halo at the
    # local tile size (propagation speed across shards is hh px per round).
    hh = max(1, min(hh, h_loc, w_loc))
    if local_saturate is not None:
        saturate = local_saturate
    elif backend == "pallas":
        from cudacam_tpu.ops.pallas.hysteresis_fused import fused_ok

        ext_h, ext_w = h_loc + 2 * hh, w_loc + 2 * hh
        saturate = (
            fused_local_saturate(cfg)
            if fused_ok(ext_h, ext_w)
            else default_local_saturate(cfg)
        )
    else:
        saturate = default_local_saturate(cfg)

    has_c = cfg.channels == 3
    frame_spec = P(BATCH_AXIS, ROW_AXIS, COL_AXIS, None) if has_c else P(BATCH_AXIS, ROW_AXIS, COL_AXIS)
    out_spec = P(BATCH_AXIS, ROW_AXIS, COL_AXIS)

    def extend2d(x: jnp.ndarray, h: int) -> jnp.ndarray:
        """Halo-extend a (h_loc, w_loc[, C]) tile in rows then cols (the
        second exchange carries the corner blocks)."""
        x = _exchange_halo(x, h, 0, ROW_AXIS, ny)
        return _exchange_halo(x, h, 1, COL_AXIS, nx)

    def _valid_mask(ext_h: int, ext_w: int, h: int) -> jnp.ndarray:
        """Bool mask of extended-tile positions that lie inside the *global*
        image. Positions outside it (only at global-border shards) must read
        as exact zeros to reproduce the single-chip zero-padding semantics
        (the ops' jnp.pad <=> the reference's tile fill, cannyEdgeD.cu:91-98):
        computing a stage on the extended tile leaves nonzero junk there
        otherwise, which the next stencil would consume."""
        ry = jax.lax.axis_index(ROW_AXIS)
        rx = jax.lax.axis_index(COL_AXIS)
        row0 = ry * h_loc - h
        col0 = rx * w_loc - h
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (ext_h, ext_w), 0)
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (ext_h, ext_w), 1)
        return (rows >= 0) & (rows < cfg.height) & (cols >= 0) & (cols < cfg.width)

    def local_feed_forward_pallas(tile: jnp.ndarray, low, high):
        """Pallas path: one fused kernel over the halo-extended tile, with
        the tile's global origin pinning border-zero semantics."""
        from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage

        ext = extend2d(tile, halo)
        mono = xla_ops.rgb2mono(ext)
        if final_stage == CannyStage.MONO:
            return _trim(mono, halo, (0, 1))
        ry = jax.lax.axis_index(ROW_AXIS)
        rx = jax.lax.axis_index(COL_AXIS)
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
            origin=(ry * h_loc - halo, rx * w_loc - halo),
            image_size=(cfg.height, cfg.width),
        )
        return _trim(out, halo, (0, 1))

    def local_feed_forward(tile: jnp.ndarray, low, high):
        """mono -> ... -> final_stage on a halo-extended tile, masking each
        intermediate outside the global image; returns the trimmed display
        buffer (or the trimmed thresh map when running to hysteresis)."""
        ext = extend2d(tile, halo)
        valid = _valid_mask(ext.shape[0], ext.shape[1], halo)
        mono = xla_ops.rgb2mono(ext)  # zeros outside stay zero: no mask needed
        if final_stage == CannyStage.MONO:
            return _trim(mono, halo, (0, 1))
        blur = xla_ops.gaussian_blur(mono, cfg.kernel_size)
        blur = jnp.where(valid, blur, jnp.uint8(0))
        if final_stage == CannyStage.GAUSSIAN:
            return _trim(blur, halo, (0, 1))
        sum_x, sum_y = xla_ops.sobel_sums(blur)
        sum_x = jnp.where(valid, sum_x, 0)
        sum_y = jnp.where(valid, sum_y, 0)
        disp_coeff = xla_ops._display_coeff(cfg)
        if final_stage == CannyStage.GRADIENT:
            out = xla_ops.nms_magnitude_u8(sum_x, sum_y, disp_coeff, cfg.norm)
            return _trim(out, halo, (0, 1))
        if final_stage == CannyStage.NMS:
            nms = xla_ops.non_max_suppression(sum_x, sum_y, disp_coeff, cfg.norm)
            nms = jnp.where(valid, nms, jnp.uint8(0))
            return _trim(nms, halo, (0, 1))
        thresh = xla_ops.compute_threshold_map(sum_x, sum_y, low, high, cfg)
        return _trim(thresh, halo, (0, 1))

    def local_hysteresis(thresh: jnp.ndarray) -> jnp.ndarray:
        """Sharded fixed point: each global round saturates the local
        halo-extended tile with ``saturate`` (default: the bit-packed
        convergence loop, ops/bitpack.py — the same implementation every
        single-chip backend runs, so the composition that executes on a pod
        is the one the virtual-mesh tests execute), then exchanges an
        ``hh``-deep halo and psum-reduces a convergence flag — the
        TPU-native replacement for the reference's per-iteration
        device->host flag readback (cannyEdgeH.cu:310,322). Padded/invalid
        cells are NO_EDGE, which is absorbing, and local saturation is
        monotone toward the global fixed point, so any saturate operator
        yields the same converged result; the operator only sets how much
        propagation each collective round carries."""

        def cond(state):
            _, changed, it = state
            return changed & (it < cfg.max_hysteresis_iters)

        def body(state):
            t, _, it = state
            t_ext = extend2d(t, hh)
            new_ext = saturate(t_ext)
            nt = _trim(new_ext, hh, (0, 1))
            local_changed = jnp.any(nt != t)
            global_changed = (
                jax.lax.psum(
                    local_changed.astype(jnp.int32),
                    (BATCH_AXIS, ROW_AXIS, COL_AXIS),
                )
                > 0
            )
            return nt, global_changed, it + 1

        state, _, _ = jax.lax.while_loop(
            cond, body, (thresh, jnp.bool_(True), jnp.int32(0))
        )
        # removeCandidates (cannyEdgeD.cu:379-395).
        return jnp.where(
            state == FINAL_EDGE, jnp.uint8(FINAL_EDGE), jnp.uint8(NO_EDGE)
        )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(frame_spec, P(), P()),
        out_specs=out_spec,
        check_vma=False,
    )
    def sharded(frame, low, high):
        ff = local_feed_forward_pallas if backend == "pallas" else local_feed_forward
        hys = local_hysteresis

        def per_frame(tile):
            out = ff(tile, low, high)
            if final_stage == CannyStage.HYSTER:
                out = hys(out)
            return out

        if backend == "pallas":
            # Pallas kernels use manual DMA grids that don't vectorise under
            # vmap; iterate the local batch inside the compiled program.
            return jax.lax.map(per_frame, frame)
        return jax.vmap(per_frame)(frame)

    @jax.jit
    def run(frame: jnp.ndarray, low: jnp.ndarray, high: jnp.ndarray) -> jnp.ndarray:
        return sharded(frame, low, high)

    return run


def shard_frame(frame, mesh: Mesh):
    """Place a host (B, H, W[, C]) frame batch onto the mesh with the
    pipeline's input sharding (device_put analog of the reference's single
    cudaMemcpy2D upload, cannyEdgeH.cu:136)."""
    spec = (
        P(BATCH_AXIS, ROW_AXIS, COL_AXIS, None)
        if frame.ndim == 4
        else P(BATCH_AXIS, ROW_AXIS, COL_AXIS)
    )
    return jax.device_put(frame, NamedSharding(mesh, spec))
