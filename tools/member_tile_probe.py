"""Member-tile measurement — run ON TPU (1 chip). VERDICT r4 task #1.

The N-chip projection previously rested on the DEGENERATE 1x1x1 sharded
row, whose program (by design) exercises none of the multi-shard
machinery: zero halo slots, static origin, no ring mask, no per-round
saturate launches. This probe times, on the single real chip, the EXACT
per-shard program a real (ny, nx) mesh member runs at 1080p / 4K tiles:

* the raw-tile halo extension (the same slice+concat ops, with the
  ppermute hop replaced by an optimization barrier — wire time is
  modeled separately from measured ICI rates);
* ``canny_mega_export`` over the granule-padded extended tile with the
  pollution ring mask and a TRACED origin (the real member's form);
* the packed-candidate + packed-final entry exchanges and R forced
  collective rounds — each round one injected local saturate (Pallas
  kernel or XLA ops, both measured) plus the full strip
  extraction/placement arithmetic of ``exchange_packed`` (real code,
  injectable permute) — R is a traced bound so every round count shares
  one executable;
* the unpack kernel.

Excluded (modeled, not measured): the ppermute wire hops (~15 KB packed
strips/round, ~0.4 MB planar strips once) and the psum all-reduce —
their cost model rides the measured ICI rate/latency class; everything
else a member executes on-chip is in the measured number. The psum's
local reduction inputs (the any-new-bits tests) ARE computed and kept
live via the carried flag.

Writes MEMBER_TILE.json (consumed by benchmark._sharded_section to build
the projection) and prints one JSON line.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu import CannyConfig
from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops.pallas.megakernel import (
    canny_mega_export,
    mega_export_geometry,
    unpack_core_call,
)
from cudacam_tpu.parallel.packed_halo import exchange_packed, make_geo
from cudacam_tpu.parallel.sharded import (
    _pl_saturate_ok,
    pallas_packed_saturate,
    xla_packed_saturate,
)
from tools.devtime import device_time_us


def _barrier(strip, axis_name, perm):
    """The wire-hop substitute: keeps the strip (and everything feeding
    it) live and unfused, moves no bytes. Wire time modeled separately."""
    del axis_name, perm
    return jax.lax.optimization_barrier(strip)


def build_member(cfg: CannyConfig, ny: int, nx: int, saturate_kind: str):
    """The single-chip emulation of one (ny, nx) member's per-frame
    program (mirrors parallel/sharded.hyster_pallas_mega + the packed
    round loop, with forced round count)."""
    h_loc, w_loc = cfg.height // ny, cfg.width // nx
    g = make_geo(h_loc, w_loc, granule=True, ny=ny, nx=nx)
    mg = mega_export_geometry(g.ext_h, g.ext_w)
    assert mg is not None, (g.ext_h, g.ext_w)
    _, _, hwp, wp = mg
    geo = dataclasses.replace(g, plane_rows=hwp, plane_lanes=wp)
    if saturate_kind == "pallas":
        assert _pl_saturate_ok(geo), "planes past the scan-kernel budget"
        saturate = pallas_packed_saturate(cfg, geo)
    else:
        saturate = xla_packed_saturate(cfg, geo)
    halo = cfg.halo

    def ext_axis(x, lo_, hi_, axis, n):
        if n == 1 or (lo_ == 0 and hi_ == 0):
            pad = [(0, 0)] * x.ndim
            pad[axis] = (lo_, hi_)
            return jnp.pad(x, pad)
        idx_lead = [slice(None)] * x.ndim
        idx_lead[axis] = slice(x.shape[axis] - lo_, None)
        idx_trail = [slice(None)] * x.ndim
        idx_trail[axis] = slice(None, hi_)
        parts = []
        if lo_:
            parts.append(_barrier(x[tuple(idx_lead)], None, None))
        parts.append(x)
        if hi_:
            parts.append(_barrier(x[tuple(idx_trail)], None, None))
        return jnp.concatenate(parts, axis=axis)

    @jax.jit
    def member(tile, row0, col0, lo, hi, rounds):
        ext = ext_axis(tile, g.e_top, g.e_bot, 0, ny)
        ext = ext_axis(ext, g.e_left, g.e_right, 1, nx)
        org = None if (ny == 1 and nx == 1) else (
            row0 - geo.e_top, col0 - geo.e_left
        )
        f, p, flags = canny_mega_export(
            jnp.transpose(ext, (2, 0, 1)),
            lo,
            hi,
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
        )
        ex = lambda x: exchange_packed(
            x, geo, "y", "x", ny, nx, permute=_barrier
        )
        p, _ = ex(p)
        f, new = ex(f)

        def body(st):
            f, _, it = st
            f, growing = saturate(f, p)
            f, new = ex(f)
            return f, growing | new, it + 1

        f, pending, _ = jax.lax.while_loop(
            lambda st: st[2] < rounds,  # FORCED round count (traced)
            body,
            (f, (flags[0, 1] == 1) | new, jnp.int32(0)),
        )
        out = unpack_core_call(f, geo.e_top, geo.e_left, h_loc, w_loc)
        return out, pending

    info = dict(
        tile=f"{h_loc}x{w_loc}",
        ext=f"{g.ext_h}x{g.ext_w}",
        planes_kb=round(hwp * wp * 4 / 1024, 1),
        strip_bytes_per_round=(wp * 4 * 2 if ny > 1 else 0)
        + (hwp * 64 * 4 * 2 if nx > 1 else 0),
    )
    return member, (h_loc, w_loc), info


def measure(name, cfg, ny, nx, kinds, r_values, out):
    h_loc, w_loc = cfg.height // ny, cfg.width // nx
    # Interior-member tiles from the streaming scene set (the member at
    # mesh position (0, 0); origin is traced either way).
    tiles = [
        jax.device_put(
            make_scene(cfg.height, cfg.width, seed=s)[:h_loc, :w_loc]
        )
        for s in range(4)
    ]
    row0 = jax.device_put(jnp.int32(0))
    col0 = jax.device_put(jnp.int32(0))
    lo, hi = jax.device_put(jnp.int32(10)), jax.device_put(jnp.int32(40))
    entry = out.setdefault(name, {})
    for kind in kinds:
        member, _, info = build_member(cfg, ny, nx, kind)
        entry.setdefault("info", info)
        res = {}
        for r in r_values:
            rr = jax.device_put(jnp.int32(r))

            def stream(*ts):
                o = None
                for t in ts:
                    o = member(t, row0, col0, lo, hi, rr)
                return o

            stream.__name__ = f"v_{name}_{kind}_r{r}"
            jax.block_until_ready(stream(*tiles))
            t = device_time_us(stream, *tiles, passes=4)
            us = round(sum(t.values()) / len(tiles), 1)
            res[str(r)] = us
            print(f"{name} {kind} R={r}: {us} us/frame", flush=True)
        entry[kind] = res


def main():
    out = {"platform": jax.devices()[0].platform}
    cfg1080 = CannyConfig(height=1080, width=1920)
    cfg4k = CannyConfig(height=2160, width=3840)
    measure("1080p_2x2", cfg1080, 2, 2, ("pallas", "xla"), (0, 1, 5, 19), out)
    measure("1080p_1x2", cfg1080, 1, 2, ("pallas", "xla"), (0, 1, 5), out)
    measure("4K_2x2", cfg4k, 2, 2, ("pallas", "xla"), (0, 5), out)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MEMBER_TILE.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": path, "configs": list(out.keys())}))


if __name__ == "__main__":
    main()
