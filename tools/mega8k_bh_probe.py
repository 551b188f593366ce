"""8K megakernel slab-height sweep (follow-up to mega8k_probe) — run ON
TPU. _pick_bh's 40 MB heuristic ignores the 8K kernel's 8.5 MB persistent
planes; this sweeps block_h to find the real optimum at the 100 MB cap,
plus the standalone FF at matching heights for reference."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu import CannyConfig
from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage
from cudacam_tpu.ops.pallas.megakernel import canny_mega
from cudacam_tpu.stages import CannyStage
from tools.devtime import device_time_us

h, w = 4320, 7680
cfg = CannyConfig(height=h, width=w)
lo, hi = np.int32(10), np.int32(40)
planar = jax.block_until_ready(
    jax.device_put(jnp.transpose(make_scene(h, w, seed=0), (2, 0, 1)))
)
out = {}

for bh in (32, 64, 96):
    fn = jax.jit(lambda p, bh=bh: canny_mega(
        p, lo, hi, dilate_steps=cfg.hysteresis_inner_steps,
        scan_after=cfg.hysteresis_scan_after, max_iters=100,
        block_h=bh)[0])
    fn.__name__ = f"v_mega_bh{bh}"
    try:
        t = device_time_us(fn, planar, passes=3)
        out[f"mega_bh{bh}"] = round(sum(t.values()), 1)
    except Exception as e:
        out[f"mega_bh{bh}"] = f"FAILED: {str(e)[:160]}"
    print(f"mega bh={bh}:", out[f"mega_bh{bh}"], flush=True)

for bh in (48, 64):
    fn = jax.jit(lambda p, bh=bh: feed_forward_to_stage(
        p, lo, hi, out_stage=CannyStage.THRESH, block_h=bh))
    fn.__name__ = f"v_ff_bh{bh}"
    try:
        t = device_time_us(fn, planar, passes=3)
        out[f"ff_bh{bh}"] = round(sum(t.values()), 1)
    except Exception as e:
        out[f"ff_bh{bh}"] = f"FAILED: {str(e)[:160]}"
    print(f"ff bh={bh}:", out[f"ff_bh{bh}"], flush=True)

print(json.dumps(out))
