"""Capture an XProf device trace of the Pallas pipeline (run ON TPU).

Usage: python tools/trace_capture.py LOGDIR [--passes N]
Prints nothing but the logdir contents; parsing happens in
tools/trace_report.py (separate process: keeps this one free of any
device->host readback other than what the profiler itself does).
"""
import os, sys, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cudacam_tpu import CannyConfig
from cudacam_tpu.engine import CannyEngine
from cudacam_tpu.io.sources import make_scene

logdir = sys.argv[1]
h, w = 1080, 1920
cfg = CannyConfig(height=h, width=w)
eng = CannyEngine(cfg)
eng.warmup()
frames = [jax.device_put(make_scene(h, w, seed=s)) for s in range(8)]
for f in frames:
    out = eng.process(f)
jax.block_until_ready(out)

t0 = time.perf_counter()
with eng.trace(logdir):
    for _ in range(4):
        for f in frames:
            out = eng.process(f)
    jax.block_until_ready(out)
dt = time.perf_counter() - t0
print(json.dumps({"traced_s": dt, "per_frame_ms": dt * 1e3 / 32}))
