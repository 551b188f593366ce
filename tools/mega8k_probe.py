"""8K megakernel decomposition probe — run ON TPU.

The first 8K megakernel measurement (100 MB scoped-VMEM cap) came in at
2668 us vs the old two-kernel XLA-loop path's 2403. Attribute it:
  * mega with max_iters=1 (FF + pack + ONE dilation round + unpack):
    isolates the feed-forward/pack cost at the mega's slab geometry;
  * mega phase-1 full (default sa) and raised sa;
  * the OLD path pieces: standalone feed-forward kernel + packed XLA
    hysteresis;
  * LAST: phase-1 exit flags (does the 8K scene escalate at sa=32? a
    taken 8K XLA continuation would dominate everything).
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
from cudacam_tpu.ops.bitpack import hysteresis_packed
from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage
from cudacam_tpu.ops.pallas.megakernel import (
    _mega_geometry,
    canny_mega,
    canny_mega_pipeline,
)
from cudacam_tpu.stages import CannyStage
from tools.devtime import device_time_us

h, w = 4320, 7680
cfg = CannyConfig(height=h, width=w)
lo, hi = np.int32(10), np.int32(40)
planar = jax.block_until_ready(
    jax.device_put(jnp.transpose(make_scene(h, w, seed=0), (2, 0, 1)))
)
out = {"geometry": _mega_geometry(h, w), "defaults": (cfg.hysteresis_inner_steps, cfg.hysteresis_scan_after)}
print("geometry (bh, n_blocks, hwp, wp):", out["geometry"], "ds/sa:",
      out["defaults"], flush=True)


def named(name, f):
    f.__name__ = name
    return jax.jit(f)


cases = {
    "mega_mi1": named("v_m1", lambda p: canny_mega(
        p, lo, hi, dilate_steps=cfg.hysteresis_inner_steps,
        scan_after=cfg.hysteresis_scan_after, max_iters=1)[0]),
    "mega_pipe_sa32": named("v_mp32", lambda p: canny_mega_pipeline(
        p, lo, hi, dilate_steps=cfg.hysteresis_inner_steps,
        scan_after=32, max_iters=100, cont="xla")),
    "mega_pipe_sa64": named("v_mp64", lambda p: canny_mega_pipeline(
        p, lo, hi, dilate_steps=cfg.hysteresis_inner_steps,
        scan_after=64, max_iters=100, cont="xla")),
    "ff_standalone": named("v_ff", lambda p: feed_forward_to_stage(
        p, lo, hi, out_stage=CannyStage.THRESH)),
}
for name, fn in cases.items():
    try:
        t = device_time_us(fn, planar, passes=3)
        out[name] = round(sum(t.values()), 1)
    except Exception as e:
        out[name] = f"FAILED: {str(e)[:160]}"
    print(name, out[name], flush=True)

# Old-path hysteresis: packed XLA loop on the standalone FF's thresh map.
thresh = jax.block_until_ready(cases["ff_standalone"](planar))
hp = named("v_hp", lambda t: hysteresis_packed(
    t, max_iters=100, dilate_steps=cfg.hysteresis_inner_steps,
    scan_after=cfg.hysteresis_scan_after))
try:
    t = device_time_us(hp, thresh, passes=3)
    out["hyster_xla_loop"] = round(sum(t.values()), 1)
except Exception as e:
    out["hyster_xla_loop"] = f"FAILED: {str(e)[:160]}"
print("hyster_xla_loop", out["hyster_xla_loop"], flush=True)

# ---- flags LAST (D2H) ----------------------------------------------------
for sa in (32, 64):
    _, fl, _, _ = canny_mega(
        planar, lo, hi, dilate_steps=cfg.hysteresis_inner_steps,
        scan_after=sa, max_iters=100)
    out[f"flags_sa{sa}"] = np.asarray(fl)[0].tolist()
    print(f"flags sa={sa}:", out[f"flags_sa{sa}"], flush=True)

print(json.dumps(out))
