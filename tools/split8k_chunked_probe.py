"""Chunked split continuation + updated 8K cliff — run ON TPU (r5).

split8k_probe measured the UNCHUNKED split at 190/101 ms (n=2/4) vs the
XLA continuation's 35 ms on the cap-class 8K state: without a round
budget each seam round re-converges every slice to the full internal
cap (max_iters^2 class). This probe measures the WIRED form —
megakernel._cont_split (chunk=8, total-round budget) — on the same
state, then the full ENGINE 8K worst case (make_spiral_frame through
CannyEngine, auto -> split) for the BENCH_TABLE escalation row.
Prints one JSON line.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu import CannyConfig
from cudacam_tpu.engine import CannyEngine
from cudacam_tpu.io.sources import make_spiral_frame, make_spiral_thresh
from cudacam_tpu.ops import bitpack
from cudacam_tpu.ops.pallas import megakernel as mk
from tools.devtime import device_time_us

h, w = 4320, 7680
cfg = CannyConfig(height=h, width=w)
sa, ds = cfg.hysteresis_scan_after, cfg.hysteresis_inner_steps
out = {"chunk": mk._SPLIT_CHUNK}

_, _, hwp, wp = mk._mega_geometry(h, w)
hw_img = -(-h // 32)
spiral = jnp.asarray(make_spiral_thresh(h, w))


@jax.jit
def prep(t):
    f, p = bitpack.pack_pair(t)
    dil, _ = bitpack._make_ops(h, w, ds)
    f = jax.lax.fori_loop(0, sa, lambda i, f: dil(f, p), f)
    fP = jnp.zeros((hwp, wp), jnp.uint32).at[:hw_img, :w].set(f)
    pP = jnp.zeros((hwp, wp), jnp.uint32).at[:hw_img, :w].set(p)
    return fP, pP


fP, pP = (jax.block_until_ready(x) for x in prep(spiral))
it0 = jax.block_until_ready(jnp.int32(sa))

cs = jax.jit(lambda f, p, it: mk._cont_split(
    f, p, it, h=h, w=w, dilate_steps=ds, max_iters=100))
cs.__name__ = "v_cont_split_chunked"
t0 = time.time()
jax.block_until_ready(cs(fP, pP, it0))
out["compile_s"] = round(time.time() - t0, 1)
t = device_time_us(cs, fP, pP, it0, passes=3)
out["cont_split_chunked_us"] = round(sum(t.values()), 1)
print("cont_split_chunked:", out["cont_split_chunked_us"], "us", flush=True)

# --- the full engine 8K worst case (auto -> split now) --------------------
sp8k = jax.device_put(make_spiral_frame(h, w))
eng = CannyEngine(cfg)
eng.warmup()


def run_wc():
    return eng.process(sp8k)


run_wc.__name__ = "v_engine_8k_wc"
jax.block_until_ready(run_wc())
t = device_time_us(run_wc, passes=3)
out["engine_8k_worstcase_us"] = round(sum(t.values()), 1)
print("engine 8K worst case:", out["engine_8k_worstcase_us"], "us",
      flush=True)

# Scene-typical 8K stream must be unchanged (untaken split branch).
from cudacam_tpu.io.sources import make_scene

frames = [jax.device_put(make_scene(h, w, seed=s)) for s in range(2)]


def run_scene():
    o = None
    for f in frames:
        o = eng.process(f)
    return o


run_scene.__name__ = "v_engine_8k_scene"
jax.block_until_ready(run_scene())
t = device_time_us(run_scene, passes=3)
out["engine_8k_scene_us_per_frame"] = round(sum(t.values()) / 2, 1)
print("engine 8K scene:", out["engine_8k_scene_us_per_frame"], "us/frame",
      flush=True)
print(json.dumps(out))
