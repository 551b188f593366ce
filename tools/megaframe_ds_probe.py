"""Mega-frame dilate_steps tuning on the r4 megakernel — run ON TPU.

The derived default (hysteresis_inner_steps = 32 past 2048 px) was tuned
on the OLD two-kernel path; the old ds sweep said the 4K scene is
fastest near 48 and the 8K one near 16 (docs/performance.md). Re-sweep
on the production megakernel with the r4 scan_after defaults, 2 scenes
per size.
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
from cudacam_tpu.ops.pallas.megakernel import canny_mega_pipeline
from tools.devtime import device_time_us

lo, hi = np.int32(10), np.int32(40)
out = {}
for h, w, dss in ((2160, 3840, (32, 48, 64)), (4320, 7680, (16, 32, 48))):
    cfg = CannyConfig(height=h, width=w)
    frames = [
        jax.block_until_ready(
            jax.device_put(jnp.transpose(make_scene(h, w, seed=s), (2, 0, 1)))
        )
        for s in range(2)
    ]
    for ds in dss:
        one = jax.jit(lambda p, ds=ds: canny_mega_pipeline(
            p, lo, hi, dilate_steps=ds,
            scan_after=cfg.hysteresis_scan_after,
            max_iters=cfg.max_hysteresis_iters,
            cont="pallas" if h == 2160 else "xla",
        ))
        one.__name__ = f"v_{h}_ds{ds}"

        def run(*ps):
            r = None
            for p in ps:
                r = one(p)
            return r

        try:
            t = device_time_us(run, *frames, passes=4)
            out[f"{h}_ds{ds}_us"] = round(sum(t.values()) / 2, 1)
        except Exception as e:
            out[f"{h}_ds{ds}_us"] = f"FAILED: {str(e)[:120]}"
        print(f"{h}p ds={ds}:", out[f"{h}_ds{ds}_us"], flush=True)
print(json.dumps(out))
