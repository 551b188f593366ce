"""Sharded packed-state pipeline probe — run ON TPU (1 chip, 1x1x1 mesh).

VERDICT r3 task #1: the r3 sharded path measured 0.2694 ms vs the 0.1187
unsharded stream (2.27x framework overhead) because every collective round
re-packed/re-unpacked the full u8 tile through the fused hysteresis kernel
and a separate XLA rgb2mono pre-pass fed the kernel. The rewrite
(parallel/packed_halo.py + megakernel.canny_mega_export) carries packed
planes as the round-loop state, with FF + pack + phase-1 in ONE megakernel
launch and a single unpack kernel at convergence.

Measures the 1x1x1 shard_map pipeline on the 8-scene 1080p stream
(device-lane time, same methodology as bench.py), then — LAST, D2H
degrades later dispatches — checks bit-exactness against the unsharded
engine path on every scene.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu import CannyConfig, CannyStage
from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops.pallas.canny import canny_to_stage_pallas
from cudacam_tpu.parallel import build_sharded_pipeline, make_mesh
from cudacam_tpu.parallel.sharded import shard_frame
from tools.devtime import device_time_us

h, w = 1080, 1920
cfg = CannyConfig(height=h, width=w)
out = {}

mesh = make_mesh(batch=1, rows=1, cols=1, devices=jax.devices()[:1])
run_sh = build_sharded_pipeline(cfg, mesh, backend="pallas")
lo, hi = jnp.int32(10), jnp.int32(40)

frames = [
    jax.block_until_ready(shard_frame(make_scene(h, w, seed=s)[None], mesh))
    for s in range(8)
]


def stream(*fs):
    r = None
    for f in fs:
        r = run_sh(f, lo, hi)
    return r


stream.__name__ = "v_shstream"
jax.block_until_ready(stream(*frames))
t = device_time_us(stream, *frames, passes=4)
out["sharded_1x1x1_us_per_frame"] = round(sum(t.values()) / 8, 1)
out["per_executable"] = {k: round(v / 8, 1) for k, v in t.items()}
print("sharded 1x1x1:", out["sharded_1x1x1_us_per_frame"], "us/frame",
      flush=True)
print("per-exec:", out["per_executable"], flush=True)

# Unsharded reference stream for the overhead ratio, same methodology.
uns = jax.jit(lambda f: canny_to_stage_pallas(
    f[0], lo, hi, cfg, CannyStage.HYSTER))
uns.__name__ = "v_unsharded"


def stream_u(*fs):
    r = None
    for f in fs:
        r = uns(f)
    return r


stream_u.__name__ = "v_ustream"
jax.block_until_ready(stream_u(*frames))
t = device_time_us(stream_u, *frames, passes=4)
out["unsharded_us_per_frame"] = round(sum(t.values()) / 8, 1)
print("unsharded:", out["unsharded_us_per_frame"], "us/frame", flush=True)

# ---- exactness LAST (D2H) ------------------------------------------------
mism = 0
for s, f in enumerate(frames):
    got = np.asarray(run_sh(f, lo, hi))[0]
    want = np.asarray(uns(f))
    if not np.array_equal(got, want):
        mism += 1
        print(f"scene {s}: MISMATCH {int((got != want).sum())} px", flush=True)
out["exact_all_scenes"] = mism == 0
print("EXACT on all 8 scenes" if mism == 0 else f"{mism} scenes differ",
      flush=True)
print(json.dumps(out))
