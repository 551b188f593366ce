"""Device-time check of the full engine pipeline at 1080p/4K/8K (run ON
TPU) — validates the diameter-scaled hysteresis defaults on mega-frames."""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from cudacam_tpu import CannyConfig
from cudacam_tpu.engine import CannyEngine
from cudacam_tpu.io.sources import make_scene
from tools.devtime import device_time_us

out = {}
for name, h, w in (("1080p", 1080, 1920), ("4k", 2160, 3840), ("8k", 4320, 7680)):
    eng = CannyEngine(CannyConfig(height=h, width=w))
    frame = jax.device_put(make_scene(h, w, seed=0))
    fn = eng.process
    jax.block_until_ready(fn(frame))
    times = device_time_us(fn, frame, passes=4)
    out[name] = {k: round(v, 1) for k, v in times.items()}
    print(name, out[name], flush=True)
print(json.dumps(out))
