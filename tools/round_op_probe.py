"""Hardware sweep of hysteresis round-operator variants (run ON TPU).

The convergence loop's cost = rounds_needed x cost_per_round; both depend on
the round operator. This probe measures, on the benchmark scene at 1080p and
4K, full-convergence device time for:

* dilate rounds with carry_every in {1, 2, 4, 8, 16} (the exact cross-word
  carry cadence — the _CARRY_EVERY constant's provenance);
* "chase" rounds: 8 chained directional carry-lookahead scans TRUNCATED to a
  small doubling depth. One chase round follows a chain through up to 8
  direction changes, covering (2^k - 1) px per monotone segment — far more
  propagation per VPU op than isotropic dilations on windy scene chains;
* hybrids (a few dilations then a truncated chase).

Every operator is monotone and dominated by the fixed point, and every
variant's round includes the 8 single-step neighbor promotions, so the
no-growth exit is exact for all of them (see ops/bitpack.py docstring).
"""
import os
import sys
import json
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.ops.bitpack import (
    _doubling_steps,
    _make_ops,
    _scan_dir,
    _shift_cols,
    _shift_px,
    pack_pair,
    unpack_mask,
)
from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage
from tools.devtime import device_time_us

lo, hi = np.int32(10), np.int32(40)


def _truncated(steps, depth):
    return tuple(s for s in steps if s < depth)


def make_chase(h, w, axial_depth, diag_depth):
    """8 chained directional scans with doubling steps truncated to cover
    (axial_depth-1) px along rows/cols and (diag_depth-1) px diagonally."""
    hsteps = _truncated(_doubling_steps(w), axial_depth)
    vsteps = _truncated(_doubling_steps(h), axial_depth)
    dsteps = _truncated(_doubling_steps(min(h, w)), diag_depth)
    directions = (
        (lambda x, s: _shift_cols(x, s), hsteps),
        (lambda x, s: _shift_cols(x, -s), hsteps),
        (lambda x, s: _shift_px(x, s), vsteps),
        (lambda x, s: _shift_px(x, -s), vsteps),
        (lambda x, s: _shift_cols(_shift_px(x, s), s), dsteps),
        (lambda x, s: _shift_cols(_shift_px(x, -s), -s), dsteps),
        (lambda x, s: _shift_cols(_shift_px(x, s), -s), dsteps),
        (lambda x, s: _shift_cols(_shift_px(x, -s), s), dsteps),
    )

    def chase(f, p):
        for shift, steps in directions:
            f = _scan_dir(f, p, shift, steps)
        return f

    return chase


def converge_loop(round_op, thresh, h, w, max_iters=100):
    """hysteresis_packed's convergence structure with a pluggable phase-1
    round operator (phase 2 escalation omitted: the probe scenes converge
    in phase 1 for every variant; escalation semantics stay in bitpack)."""
    f, p = pack_pair(thresh)

    def count(f):
        return jnp.sum(jax.lax.population_count(f), dtype=jnp.int32)

    f1 = round_op(f, p)

    def cond(state):
        _, prev, cur, it = state
        return (cur > prev) & (it < max_iters)

    def body(state):
        f, _, cur, it = state
        nf = round_op(f, p)
        return nf, cur, count(nf), it + 1

    f_fix, _, _, iters = jax.lax.while_loop(
        cond, body, (f1, count(f), count(f1), jnp.int32(1))
    )
    return unpack_mask(f_fix, h), iters


def named(name, f):
    f.__name__ = name
    return jax.jit(f)


def run_size(h, w, tag):
    frame = jax.device_put(make_scene(h, w, seed=0))
    thresh = jax.block_until_ready(
        jax.jit(
            lambda f: feed_forward_to_stage(xla_ops.rgb2mono(f), lo, hi)
        )(frame)
    )
    ref = None

    variants = []
    for ce in (1, 2, 4, 8, 16):
        dil, _ = _make_ops(h, w, 16, carry_every=ce)
        variants.append((f"dil16_ce{ce}", dil))
    for ds in (8, 32, 48):
        dil, _ = _make_ops(h, w, ds, carry_every=4)
        variants.append((f"dil{ds}_ce4", dil))
    for ad, dd in ((8, 4), (16, 4), (16, 8), (32, 8), (64, 8), (16, 16),
                   (32, 16), (64, 16), (128, 16), (64, 32)):
        variants.append((f"chase_a{ad}_d{dd}", make_chase(h, w, ad, dd)))
    for nd, ad, dd in ((4, 16, 8), (8, 32, 8), (4, 64, 16)):
        dil, _ = _make_ops(h, w, nd, carry_every=4)
        chase = make_chase(h, w, ad, dd)
        variants.append(
            (f"hyb_d{nd}_a{ad}_dd{dd}",
             lambda f, p, dil=dil, chase=chase: chase(dil(f, p), p))
        )

    out = {}
    check = []
    for name, op in variants:
        fn = named(
            f"v3_{name}_{tag}",
            functools.partial(converge_loop, op, h=h, w=w),
        )
        res = jax.block_until_ready(fn(thresh))
        times = device_time_us(fn, thresh, passes=6)
        tot = round(sum(times.values()), 1)
        out[name] = tot
        print(tag, name, tot, flush=True)
        check.append((name, res))

    # Correctness + iteration counts AFTER all timing (D2H degrades later
    # dispatches on this deployment — CLAUDE.md).
    iters = {}
    for name, (mask, it) in check:
        m = np.asarray(mask)
        if ref is None:
            ref = m
        else:
            assert (m == ref).all(), f"{name} diverged from reference result"
        iters[name] = int(it)
    out["_iters"] = iters
    return out


results = {}
for key, h, w, tag in (("1080p", 1080, 1920, "fhd"), ("4k", 2160, 3840, "uhd")):
    results[key] = run_size(h, w, tag)
print(json.dumps(results, indent=1))
