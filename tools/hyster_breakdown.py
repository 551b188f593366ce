"""Device-time breakdown of hysteresis_packed internals (run ON TPU).

Isolates: pack+transpose+unpack overhead, one fused dilation round, one
8-direction scan round, and the full convergence loop — at 1080p and 4K —
so optimization effort goes where the microseconds are.
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.ops.bitpack import (
    _make_ops,
    hysteresis_packed,
    pack_mask,
    unpack_mask,
)
from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage
from cudacam_tpu.stages import CANDIDATE_EDGE, FINAL_EDGE
from tools.devtime import device_time_us

lo, hi = np.int32(10), np.int32(40)


def named(name, f):
    f.__name__ = name
    return jax.jit(f)


def run_size(h, w, tag):
    frame = jax.device_put(make_scene(h, w, seed=0))
    thresh = jax.block_until_ready(
        jax.jit(
            lambda f: feed_forward_to_stage(
                xla_ops.rgb2mono(f), lo, hi
            )
        )(frame)
    )

    pack_fn = named(f"v_pack_{tag}", lambda t: (
        pack_mask(t == FINAL_EDGE),
        pack_mask(t == CANDIDATE_EDGE),
    ))
    f0, p0 = jax.block_until_ready(pack_fn(thresh))

    unpack_fn = named(
        f"v_unpack_{tag}",
        lambda f: jnp.where(
            unpack_mask(f, h), jnp.uint8(FINAL_EDGE), jnp.uint8(0)
        ),
    )
    jax.block_until_ready(unpack_fn(f0))

    dilates, scans = _make_ops(h, w, 16)
    dil_fn = named(f"v_dil16_{tag}", dilates)
    scan_fn = named(f"v_scan8_{tag}", scans)
    jax.block_until_ready(dil_fn(f0, p0))
    jax.block_until_ready(scan_fn(f0, p0))

    variants = [
        ("pack_T", pack_fn, (thresh,)),
        ("unpack_T", unpack_fn, (f0,)),
        ("dilate_x16", dil_fn, (f0, p0)),
        ("scans_x8", scan_fn, (f0, p0)),
    ]
    for sa, ds in ((10, 16), (100, 16), (100, 32)):
        fn = named(
            f"v_full_sa{sa}ds{ds}_{tag}",
            lambda t, sa=sa, ds=ds: hysteresis_packed(
                t, max_iters=100, scan_after=sa, dilate_steps=ds
            ),
        )
        jax.block_until_ready(fn(thresh))
        variants.append((f"full_sa{sa}_ds{ds}", fn, (thresh,)))

    out = {}
    for name, fn, args in variants:
        times = device_time_us(fn, *args, passes=6)
        out[name] = {k: round(v, 1) for k, v in times.items()}
        print(tag, name, out[name], flush=True)

    # Defer the convergence-count readback: any D2H degrades every later
    # dispatch in this process (CLAUDE.md), so it must run after ALL timing.
    full_it = named(
        f"v_fullit_{tag}",
        lambda t: hysteresis_packed(t, max_iters=100, return_iters=True)[1],
    )

    def read_iters():
        out["iters_to_converge"] = int(jax.device_get(full_it(thresh)))

    return out, read_iters


results = {}
deferred = []
for key, h, w, tag in (("1080p", 1080, 1920, "fhd"), ("4k", 2160, 3840, "uhd")):
    results[key], rd = run_size(h, w, tag)
    deferred.append(rd)
for rd in deferred:
    rd()
print(json.dumps(results))
