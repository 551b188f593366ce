"""Decompose the member-tile R=0 floor — run ON TPU. VERDICT r4 task #2.

member_tile_probe measured the 1080p 2x2 member's R=0 program at
117.3 us — barely below the FULL unsharded frame (118.9) despite 1/4 the
pixels, while the 4K member scales with pixels (fixed ~31 us). This
probe splits the R=0 program into its launches to locate the floor:

  A. raw-tile extension (concat ops) alone;
  B. A + export-mode megakernel (traced origin + ring);
  C. B with a STATIC origin/no ring (the traced-origin+ring tax);
  D. unpack_core_call alone on a resident plane;
  E. the full R=0 member (= member_tile_probe's number, control);
  F. saturate_packed alone on resident planes (per-launch cost of one
     collective round's kernel, no exchange glue).

Prints one JSON line with the us-per-frame of each.
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
from cudacam_tpu.parallel.packed_halo import make_geo
from cudacam_tpu.parallel.sharded import pallas_packed_saturate
from tools.member_tile_probe import build_member
from tools.devtime import device_time_us

cfg = CannyConfig(height=1080, width=1920)
ny = nx = 2
h_loc, w_loc = cfg.height // ny, cfg.width // nx
g = make_geo(h_loc, w_loc, granule=True, ny=ny, nx=nx)
_, _, hwp, wp = mega_export_geometry(g.ext_h, g.ext_w)
geo = dataclasses.replace(g, plane_rows=hwp, plane_lanes=wp)
halo = cfg.halo

tiles = [
    jax.device_put(make_scene(cfg.height, cfg.width, seed=s)[:h_loc, :w_loc])
    for s in range(4)
]
row0 = jax.device_put(jnp.int32(0))
col0 = jax.device_put(jnp.int32(0))
lo, hi = jax.device_put(jnp.int32(10)), jax.device_put(jnp.int32(40))
out = {}


def bar(x):
    return jax.lax.optimization_barrier(x)


def ext_tile(tile):
    top = bar(tile[h_loc - g.e_top:])
    bot = bar(tile[: g.e_bot])
    x = jnp.concatenate([top, tile, bot], axis=0)
    left = bar(x[:, w_loc - g.e_left:])
    right = bar(x[:, : g.e_right])
    return jnp.concatenate([left, x, right], axis=1)


def measure(name, fn, *extra):
    def stream(*ts):
        o = None
        for t in ts:
            o = fn(t, *extra)
        return o

    stream.__name__ = f"v_{name}"
    jax.block_until_ready(stream(*tiles))
    t = device_time_us(stream, *tiles, passes=4)
    us = round(sum(t.values()) / len(tiles), 1)
    out[name] = us
    print(f"{name}: {us} us", flush=True)


# A. extension alone (sum so the concat isn't DCE'd into nothing).
measure("A_ext_only", jax.jit(lambda t: ext_tile(t).sum()))

# B. extension + export mega (traced origin, ring) — planes as output.
kw = dict(
    image_size=(cfg.height, cfg.width),
    kernel_size=cfg.kernel_size, grad_coeff=cfg.grad_coeff,
    norm=cfg.norm, parity=cfg.parity,
    dilate_steps=cfg.hysteresis_inner_steps,
    scan_after=cfg.hysteresis_scan_after,
    max_iters=cfg.max_hysteresis_iters,
)


@jax.jit
def b_fn(tile, r0, c0):
    ext = ext_tile(tile)
    return canny_mega_export(
        jnp.transpose(ext, (2, 0, 1)), lo, hi,
        (r0 - geo.e_top, c0 - geo.e_left), ring=(halo, halo), **kw
    )


measure("B_ext_mega_traced", b_fn, row0, col0)


# C. static origin / zero ring (degenerate-mesh kernel form).
@jax.jit
def c_fn(tile):
    ext = ext_tile(tile)
    return canny_mega_export(
        jnp.transpose(ext, (2, 0, 1)), lo, hi, None, ring=(0, 0), **kw
    )


measure("C_ext_mega_static", c_fn)

# D. unpack alone on a resident converged plane.
@jax.jit
def d_fn(f):
    return unpack_core_call(f, geo.e_top, geo.e_left, h_loc, w_loc)


def stream_d(*fs):
    o = None
    for f in fs:
        o = d_fn(f)
    return o


planes = [jax.device_put(jax.block_until_ready(
    b_fn(t, row0, col0))[0]) for t in tiles]
stream_d.__name__ = "v_D_unpack_only"
jax.block_until_ready(stream_d(*planes))
t = device_time_us(stream_d, *planes, passes=4)
out["D_unpack_only"] = round(sum(t.values()) / len(planes), 1)
print("D_unpack_only:", out["D_unpack_only"], "us", flush=True)

# F. one saturate launch on resident planes.
sat = pallas_packed_saturate(cfg, geo)
p_planes = [jax.device_put(jax.block_until_ready(
    b_fn(t, row0, col0))[1]) for t in tiles]
sat_j = jax.jit(lambda f, p: sat(f, p))


def stream_f(*pairs):
    o = None
    for f, p in zip(pairs[::2], pairs[1::2]):
        o = sat_j(f, p)
    return o


inter = [x for fp in zip(planes, p_planes) for x in fp]
stream_f.__name__ = "v_F_saturate_only"
jax.block_until_ready(stream_f(*inter))
t = device_time_us(stream_f, *inter, passes=4)
out["F_saturate_only"] = round(sum(t.values()) / len(planes), 1)
print("F_saturate_only:", out["F_saturate_only"], "us", flush=True)

# E. control: the full R=0 member from the main probe's builder.
member, _, _ = build_member(cfg, ny, nx, "pallas")
r0j = jax.device_put(jnp.int32(0))


def stream_e(*ts):
    o = None
    for t in ts:
        o = member(t, row0, col0, lo, hi, r0j)
    return o


stream_e.__name__ = "v_E_member_r0"
jax.block_until_ready(stream_e(*tiles))
t = device_time_us(stream_e, *tiles, passes=4)
out["E_member_r0"] = round(sum(t.values()) / len(tiles), 1)
print("E_member_r0:", out["E_member_r0"], "us", flush=True)

print(json.dumps(out))
