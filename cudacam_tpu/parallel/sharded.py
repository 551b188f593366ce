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
- the whole mono->threshold chain runs on a once-extended tile, so there is
  ONE halo exchange for all feed-forward stages, not one per stage;
- hysteresis converges on BIT-PACKED planes (ops/bitpack.py's layout) that
  stay the carried state across collective rounds
  (parallel/packed_halo.py): pack happens once per frame — on the Pallas
  backend *inside* the feed-forward megakernel
  (megakernel.canny_mega_export: raw planar tile in, packed planes out, one
  launch) — each round exchanges packed strips (1 word-row / 64 u32 lanes
  per side, ~1/8th the bytes of u8 halos) and runs an injectable local
  saturate (``bitpack.converge_packed`` as XLA ops or the fused Pallas
  kernel ``hysteresis_fused.saturate_packed`` — the ONE shared
  ``bitpack._make_ops`` round schedule either way), and a ``psum``'d
  convergence flag replaces the reference's per-iteration device->host
  flag readback (cannyEdgeH.cu:310,322). Unpack happens once, at global
  convergence. Collective rounds are bounded by the cross-shard edge
  diameter, not the pixel diameter.

Correctness note (pollution depth): running the zero-padding single-chip ops
on a tile extended by the *total* halo H yields exact values in the core,
because stage k's output at extended-row r is exact for r >= (sum of stage
halos up to k), which is <= H at the final pre-hysteresis stage. The Pallas
path computes the feed-forward over the DEEPER hysteresis extension and
zeroes the polluted outer ring in-kernel (megakernel ``ring`` mask), which
additionally pre-populates the halo slots with exact neighbor state.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from cudacam_tpu.config import CannyConfig
from cudacam_tpu.ops import bitpack, xla_ops
from cudacam_tpu.parallel.mesh import AXES, BATCH_AXIS, COL_AXIS, ROW_AXIS
from cudacam_tpu.parallel.packed_halo import (
    PackedGeo,
    make_geo,
    packed_hysteresis_loop,
)
from cudacam_tpu.stages import FINAL_EDGE, NO_EDGE, CannyStage

shard_map = jax.shard_map


def _exchange_halo(
    x: jnp.ndarray, lo: int, hi: int, axis: int, axis_name: str, n: int
) -> jnp.ndarray:
    """Extend local tile along ``axis`` with ``lo`` rows/cols before and
    ``hi`` after, fetched from the mesh neighbors on ``axis_name``.
    Boundary shards receive zeros (= the global zero padding of the
    reference's tile fill). ``lo``/``hi`` must not exceed the local tile
    extent (a shard can only export what it owns)."""
    if n == 1 or (lo == 0 and hi == 0):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (lo, hi)
        return jnp.pad(x, pad)
    down = [(i, i + 1) for i in range(n - 1)]  # shard i -> i+1
    up = [(i + 1, i) for i in range(n - 1)]  # shard i+1 -> i

    def take(start: Optional[int], stop: Optional[int]) -> jnp.ndarray:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, stop)
        return x[tuple(idx)]

    parts = []
    if lo:
        # my leading halo = upper neighbor's trailing rows
        parts.append(jax.lax.ppermute(take(-lo, None), axis_name, down))
    parts.append(x)
    if hi:
        parts.append(jax.lax.ppermute(take(None, hi), axis_name, up))
    return jnp.concatenate(parts, axis=axis)


def _trim(x: jnp.ndarray, h: int, axes: tuple[int, ...]) -> jnp.ndarray:
    idx = [slice(None)] * x.ndim
    for a in axes:
        idx[a] = slice(h, x.shape[a] - h)
    return x[tuple(idx)]


def _pl_saturate_ok(geo: PackedGeo) -> bool:
    """The Pallas saturate kernel includes the phase-2 scans, whose
    compile budget is the fused hysteresis kernel's plane budget."""
    from cudacam_tpu.ops.pallas.hysteresis_fused import _PLANE_BUDGET

    return geo.plane_rows * geo.plane_lanes * 4 <= _PLANE_BUDGET


def xla_packed_saturate(cfg: CannyConfig, geo: PackedGeo) -> Callable:
    """The portable local-saturation operator for the packed round loop:
    ``bitpack.converge_packed`` (both escalating phases of the ONE shared
    round schedule) directly on the carried planes. Pure jnp — identical
    code on CPU virtual meshes, a real TPU slice, and a multi-process
    pod."""

    def saturate(f, p):
        nf, _, growing = bitpack.converge_packed(
            f, p, geo.ext_h, geo.ext_w,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
            max_iters=cfg.max_hysteresis_iters,
        )
        return nf, growing

    return saturate


def pallas_packed_saturate(
    cfg: CannyConfig, geo: PackedGeo, interpret: bool = False
) -> Callable:
    """The Pallas local-saturation operator: the whole two-phase
    convergence in ONE kernel on the VMEM-resident planes
    (hysteresis_fused.saturate_packed) — same factory schedule, so
    swapping operators never changes the converged result."""
    from cudacam_tpu.ops.pallas.hysteresis_fused import saturate_packed

    def saturate(f, p):
        return saturate_packed(
            f, p, geo.ext_h, geo.ext_w,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
            max_iters=cfg.max_hysteresis_iters,
            interpret=interpret,
        )

    return saturate


def build_sharded_pipeline(
    cfg: CannyConfig,
    mesh: Mesh,
    final_stage: CannyStage = CannyStage.HYSTER,
    backend: str = "xla",
    local_saturate: Optional[Callable] = None,
) -> Callable:
    """Return a jitted fn(frame, low, high) running the pipeline sharded over
    ``mesh``. ``frame`` is (B, H, W[, C]) uint8 with B % mesh('b') == 0,
    H % mesh('y') == 0, W % mesh('x') == 0.

    ``backend='pallas'`` (real TPU meshes) runs each shard through the
    export-mode megakernel (raw planar halo-extended tile -> packed planes,
    one launch, zero XLA pre-passes) and the fused Pallas saturate;
    'xla' is the portable default (virtual CPU meshes, the driver dry-run).
    Both run the same packed round loop (parallel/packed_halo.py) with
    ``local_saturate`` as the injectable ``(f, p) -> (f, growing)``
    operator (default: the backend's packed saturate above).
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

    # --- hysteresis state geometry (packed_halo module docstring) ---------
    # The Pallas path computes feed-forward + pack + phase-1 in ONE
    # megakernel over the granule-padded extension; it needs the extension
    # depths (<= 39 rows / 191 cols) to fit the neighbor tile, and the
    # packed planes to fit the kernel's VMEM budget. Everything else uses
    # the minimal extension with the XLA packed ops.
    use_mega = False
    mega_geo = None
    if backend == "pallas" and final_stage == CannyStage.HYSTER:
        from cudacam_tpu.ops.pallas.megakernel import mega_export_geometry

        g = make_geo(h_loc, w_loc, granule=True, ny=ny, nx=nx)
        if (ny == 1 or h_loc >= max(40, g.e_bot)) and (
            nx == 1 or w_loc >= max(192, g.e_right)
        ):
            mg = mega_export_geometry(g.ext_h, g.ext_w)
            if mg is not None:
                use_mega = True
                _, _, hwp, wp = mg
                mega_geo = dataclasses.replace(
                    g, plane_rows=hwp, plane_lanes=wp
                )
    geo = (
        mega_geo
        if use_mega
        else make_geo(h_loc, w_loc, granule=False, ny=ny, nx=nx)
    )

    if local_saturate is not None:
        saturate = local_saturate
    elif use_mega and _pl_saturate_ok(geo):
        saturate = pallas_packed_saturate(cfg, geo, interpret=cfg.interpret)
    else:
        # Portable — and also the route for tiles whose planes exceed the
        # SCAN kernel's budget (the saturate kernel carries the
        # 8-direction scans, which don't compile at 8K-class shapes;
        # docs/performance.md).
        saturate = xla_packed_saturate(cfg, geo)

    has_c = cfg.channels == 3
    frame_spec = P(BATCH_AXIS, ROW_AXIS, COL_AXIS, None) if has_c else P(BATCH_AXIS, ROW_AXIS, COL_AXIS)
    out_spec = P(BATCH_AXIS, ROW_AXIS, COL_AXIS)

    def extend2d(x: jnp.ndarray, h: int) -> jnp.ndarray:
        """Symmetric halo extension in rows then cols (the second exchange
        carries the corner blocks)."""
        x = _exchange_halo(x, h, h, 0, ROW_AXIS, ny)
        return _exchange_halo(x, h, h, 1, COL_AXIS, nx)

    def extend2d_asym(x: jnp.ndarray) -> jnp.ndarray:
        """Halo extension to the packed-state grid (geo's asymmetric
        depths; granule-padded on the Pallas path)."""
        x = _exchange_halo(x, geo.e_top, geo.e_bot, 0, ROW_AXIS, ny)
        return _exchange_halo(x, geo.e_left, geo.e_right, 1, COL_AXIS, nx)

    def _origin():
        ry = jax.lax.axis_index(ROW_AXIS)
        rx = jax.lax.axis_index(COL_AXIS)
        return ry * h_loc, rx * w_loc

    def _valid_mask(ext_h: int, ext_w: int, h: int) -> jnp.ndarray:
        """Bool mask of extended-tile positions that lie inside the *global*
        image. Positions outside it (only at global-border shards) must read
        as exact zeros to reproduce the single-chip zero-padding semantics
        (the ops' jnp.pad <=> the reference's tile fill, cannyEdgeD.cu:91-98):
        computing a stage on the extended tile leaves nonzero junk there
        otherwise, which the next stencil would consume."""
        row0, col0 = _origin()
        rows = row0 - h + jax.lax.broadcasted_iota(jnp.int32, (ext_h, ext_w), 0)
        cols = col0 - h + jax.lax.broadcasted_iota(jnp.int32, (ext_h, ext_w), 1)
        return (rows >= 0) & (rows < cfg.height) & (cols >= 0) & (cols < cfg.width)

    def local_feed_forward_pallas(tile: jnp.ndarray, low, high):
        """Pallas path for display stages: one fused kernel over the
        halo-extended tile, with the tile's global origin pinning
        border-zero semantics. Granule-eligible tiles feed the kernel the
        RAW planar extension (zero XLA pre-passes — the asymmetric
        extension grid is granule-padded by construction); others fall
        back to the XLA mono pass."""
        from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage

        ff_stage = (
            final_stage if final_stage != CannyStage.HYSTER else CannyStage.THRESH
        )
        # Mesh-aware geometry: a single-shard axis has no neighbors, so it
        # carries no halo extension (only granule padding) — and a FULLY
        # degenerate mesh passes origin=None so the kernel's valid-mask
        # strips stay static (the same traced-origin constant-fold tax
        # hyster_pallas_mega avoids, ~7 us/frame; ADVICE r4).
        g = make_geo(h_loc, w_loc, granule=True, ny=ny, nx=nx)
        if (
            final_stage != CannyStage.MONO
            and (ny == 1 or h_loc >= g.e_bot)
            and (nx == 1 or w_loc >= g.e_right)
        ):
            if ny == 1 and nx == 1:
                org = None  # tile IS the global frame (granule pads are
                # masked via image_size; origin stays a static zero)
            else:
                row0, col0 = _origin()
                org = (
                    0 if ny == 1 else row0 - g.e_top,
                    0 if nx == 1 else col0 - g.e_left,
                )
            ext = _exchange_halo(tile, g.e_top, g.e_bot, 0, ROW_AXIS, ny)
            ext = _exchange_halo(ext, g.e_left, g.e_right, 1, COL_AXIS, nx)
            out = feed_forward_to_stage(
                jnp.transpose(ext, (2, 0, 1)) if has_c else ext,
                low,
                high,
                kernel_size=cfg.kernel_size,
                grad_coeff=cfg.grad_coeff,
                norm=cfg.norm,
                parity=cfg.parity,
                out_stage=ff_stage,
                origin=org,
                image_size=(cfg.height, cfg.width),
            )
            return out[
                g.e_top : g.e_top + h_loc, g.e_left : g.e_left + w_loc
            ]
        row0, col0 = _origin()
        ext = extend2d(tile, halo)
        mono = xla_ops.rgb2mono(ext)
        if final_stage == CannyStage.MONO:
            return _trim(mono, halo, (0, 1))
        out = feed_forward_to_stage(
            mono,
            low,
            high,
            kernel_size=cfg.kernel_size,
            grad_coeff=cfg.grad_coeff,
            norm=cfg.norm,
            parity=cfg.parity,
            out_stage=ff_stage,
            origin=(row0 - halo, col0 - halo),
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

    def hyster_from_thresh(thresh: jnp.ndarray) -> jnp.ndarray:
        """Portable packed hysteresis from a trimmed core threshold map:
        pack ONCE into the extended grid (zero halos — the first exchange
        populates them), run the packed collective round loop, unpack
        ONCE. Replaces r3's per-round full-tile pack/unpack + u8 halo
        exchange (2.27x framework overhead, VERDICT r3)."""
        t_ext = jnp.pad(
            thresh,
            (
                (geo.e_top, geo.ext_h - geo.e_top - h_loc),
                (geo.e_left, geo.ext_w - geo.e_left - w_loc),
            ),
        )
        f, p = bitpack.pack_pair(t_ext)
        pad = (
            (0, geo.plane_rows - f.shape[0]),
            (0, geo.plane_lanes - geo.ext_w),
        )
        f, p = jnp.pad(f, pad), jnp.pad(p, pad)
        f = packed_hysteresis_loop(
            f, p, jnp.bool_(True), geo, saturate, AXES, ny, nx,
            cfg.max_hysteresis_iters,
        )
        reached = bitpack.unpack_mask(
            f[: geo.hw, geo.e_left : geo.e_left + w_loc],
            geo.e_top + h_loc,
        )[geo.e_top :]
        # removeCandidates (cannyEdgeD.cu:379-395).
        return jnp.where(
            reached, jnp.uint8(FINAL_EDGE), jnp.uint8(NO_EDGE)
        )

    def hyster_pallas_mega(tile: jnp.ndarray, low, high) -> jnp.ndarray:
        """The Pallas hot path: ONE megakernel launch per tile (raw planar
        extension in, locally-phase-1-converged packed planes out), the
        packed round loop with the fused saturate kernel, one unpack
        kernel at convergence."""
        from cudacam_tpu.ops.pallas.megakernel import (
            canny_mega_export,
            unpack_core_call,
        )

        ext = extend2d_asym(tile)
        if ny == 1 and nx == 1:
            # Degenerate mesh: the tile IS the global frame (zero halo
            # slots, zero ring) — a None origin keeps the kernel's
            # valid-mask strips static, exactly the unsharded program.
            org = None
        else:
            row0, col0 = _origin()
            org = (row0 - geo.e_top, col0 - geo.e_left)
        f, p, flags = canny_mega_export(
            jnp.transpose(ext, (2, 0, 1)) if has_c else ext,
            low,
            high,
            org,
            image_size=(cfg.height, cfg.width),
            ring=(halo if ny > 1 else 0, halo if nx > 1 else 0),
            kernel_size=cfg.kernel_size,
            grad_coeff=cfg.grad_coeff,
            norm=cfg.norm,
            parity=cfg.parity,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
            max_iters=cfg.max_hysteresis_iters,
            interpret=cfg.interpret,
        )
        f = packed_hysteresis_loop(
            f, p, flags[0, 1] == 1, geo, saturate, AXES, ny, nx,
            cfg.max_hysteresis_iters,
        )
        return unpack_core_call(
            f, geo.e_top, geo.e_left, h_loc, w_loc, interpret=cfg.interpret
        )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(frame_spec, P(), P()),
        out_specs=out_spec,
        check_vma=False,
    )
    def sharded(frame, low, high):
        def per_frame(tile):
            if final_stage == CannyStage.HYSTER and use_mega:
                return hyster_pallas_mega(tile, low, high)
            if final_stage != CannyStage.HYSTER and backend == "pallas":
                return local_feed_forward_pallas(tile, low, high)
            if backend == "pallas":
                thresh = local_feed_forward_pallas(tile, low, high)
            else:
                thresh = local_feed_forward(tile, low, high)
            if final_stage == CannyStage.HYSTER:
                return hyster_from_thresh(thresh)
            return thresh

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
