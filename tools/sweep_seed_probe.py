"""Monotone-seeded threshold sweep probe — run ON TPU. VERDICT r4 task #4.

Measures sweep_fused with and without monotone_seed at 1080p and 4K
(K=16, the bench sweep's pair grid), checks bit-exactness of the seeded
form against the cold form LAST (D2H degrades later dispatches), and
prints one JSON line. If the seeded form wins, ops/pallas/canny.py flips
it on for the production sweep.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu import CannyConfig
from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.ops.pallas.feedforward import feed_forward_nmsq
from cudacam_tpu.ops.pallas.hysteresis_fused import sweep_fused, sweep_ok
from tools.devtime import device_time_us

K = 16
lows = np.linspace(5, 60, K).astype(np.int32)
highs = np.linspace(20, 180, K).astype(np.int32)
out = {}


def bounds_for(cfg):
    # Host-side mirror of xla_ops.threshold_magnitude_bound (no D2H —
    # any device->host readback degrades subsequent dispatches here).
    def bound(t):
        s_min = ((int(t) + 1) * 8 + cfg.grad_coeff - 1) // cfg.grad_coeff
        return s_min * s_min if cfg.norm == "l2" else s_min

    return jnp.asarray(
        [x for lo, hi in zip(lows, highs)
         for x in (bound(lo) - 1, bound(hi) - 1)],
        jnp.int32,
    )


for name, (h, w) in (("1080p", (1080, 1920)), ("4K", (2160, 3840))):
    cfg = CannyConfig(height=h, width=w)
    assert sweep_ok(K, h, w), (name, "sweep kernel out of budget")
    frame = jax.device_put(make_scene(h, w, seed=0))
    kg = jax.block_until_ready(jax.jit(
        lambda f: feed_forward_nmsq(
            jnp.transpose(f, (2, 0, 1)),
            kernel_size=cfg.kernel_size, grad_coeff=cfg.grad_coeff,
            norm=cfg.norm,
        )
    )(frame))
    kg = jax.device_put(kg)
    bounds = jax.device_put(bounds_for(cfg))
    kw = dict(
        max_iters=cfg.max_hysteresis_iters,
        dilate_steps=cfg.hysteresis_inner_steps,
        scan_after=cfg.hysteresis_scan_after,
    )
    for seeded in (False, True):
        fn = jax.jit(lambda kg, b, s=seeded: sweep_fused(
            kg, b, monotone_seed=s, **kw))
        fn.__name__ = f"v_sweep_{name}_{'warm' if seeded else 'cold'}"
        jax.block_until_ready(fn(kg, bounds))
        t = device_time_us(fn, kg, bounds, passes=4)
        us = round(sum(t.values()), 1)
        out[f"{name}_{'seeded' if seeded else 'cold'}_us"] = us
        print(f"{name} {'seeded' if seeded else 'cold'}: {us} us", flush=True)

# ---- exactness LAST (D2H) --------------------------------------------------
cfg = CannyConfig(height=1080, width=1920)
frame = jax.device_put(make_scene(1080, 1920, seed=0))
kg = jax.jit(lambda f: feed_forward_nmsq(
    jnp.transpose(f, (2, 0, 1)), kernel_size=cfg.kernel_size,
    grad_coeff=cfg.grad_coeff, norm=cfg.norm))(frame)
bounds = jax.device_put(bounds_for(cfg))
kw = dict(max_iters=cfg.max_hysteresis_iters,
          dilate_steps=cfg.hysteresis_inner_steps,
          scan_after=cfg.hysteresis_scan_after)
cold = np.asarray(sweep_fused(kg, bounds, **kw))
warm = np.asarray(sweep_fused(kg, bounds, monotone_seed=True, **kw))
out["exact"] = bool(np.array_equal(cold, warm))
print("EXACT" if out["exact"] else "MISMATCH", flush=True)
print(json.dumps(out))
