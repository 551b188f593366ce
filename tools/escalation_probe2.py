"""Escalation-policy probe, part B — run ON TPU.

Part A (escalation_probe.py) established: ks=3 scenes escalate 1/8 at
scan_after=12 and converge in phase 1 (31 rounds) when allowed; raising
scan_after also shrinks every spiral ceiling (the cap then truncates the
expensive scan rounds). Part A's per-config stream rows were invalid —
the 8 chained pipeline calls inside one jit were dead-code-eliminated
down to the last frame. This probe measures streams the way bench.py
does: one dispatch per frame, separate executables summed from the trace.

Questions:
  * 1080p stream cost at sa=12 vs 48 vs 64 for ks=3 and ks=5 (expected:
    ks3 drops ~2x when the one escalating scene stays in phase 1;
    ks5 unchanged);
  * 4K scenes: phase-1 exit flags at sa=12/24/48/72 (docs say 4K scenes
    escalate scene-typically — do they converge in phase 1 when allowed,
    and at what round count?), and stream cost at the candidate defaults;
  * spiral taken-XLA-continuation at sa=64 (the engine's adversarial
    ceiling component at the candidate default).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu import CannyConfig
from cudacam_tpu.io.sources import make_scene, make_spiral_thresh
from cudacam_tpu.ops import bitpack
from cudacam_tpu.ops.pallas import megakernel as mk
from cudacam_tpu.ops.pallas.megakernel import canny_mega, canny_mega_pipeline
from tools.devtime import device_time_us

out = {}
lo, hi = np.int32(10), np.int32(40)


def stream_cost(h, w, ks, sa, n_frames=4, cont="xla"):
    cfg = CannyConfig(height=h, width=w, kernel_size=ks,
                      hysteresis_scan_after=sa)
    frames = [
        jax.block_until_ready(
            jax.device_put(jnp.transpose(make_scene(h, w, seed=s), (2, 0, 1)))
        )
        for s in range(n_frames)
    ]

    @jax.jit
    def one(p):
        return canny_mega_pipeline(
            p, lo, hi, kernel_size=ks,
            dilate_steps=cfg.hysteresis_inner_steps, scan_after=sa,
            max_iters=cfg.max_hysteresis_iters, cont=cont,
        )

    one.__name__ = f"v_{h}_ks{ks}_sa{sa}"

    def run(*ps):
        r = None
        for p in ps:
            r = one(p)
        return r

    t = device_time_us(run, *frames, passes=4)
    return round(sum(t.values()) / n_frames, 1)


for ks in (3, 5):
    for sa in (12, 48, 64):
        key = f"stream1080_ks{ks}_sa{sa}_us"
        try:
            out[key] = stream_cost(1080, 1920, ks, sa, n_frames=8)
        except Exception as e:
            out[key] = f"FAILED: {str(e)[:120]}"
        print(key, out[key], flush=True)

for sa in (12, 24, 48):
    key = f"stream4k_sa{sa}_us"
    try:
        out[key] = stream_cost(2160, 3840, 5, sa, n_frames=2, cont="pallas")
    except Exception as e:
        out[key] = f"FAILED: {str(e)[:120]}"
    print(key, out[key], flush=True)

# Spiral taken-XLA-continuation at sa=64 (candidate default).
h, w = 1080, 1920
spiral = jax.block_until_ready(jax.device_put(jnp.asarray(make_spiral_thresh(h, w))))
_, _, hwp, wp = mk._mega_geometry(h, w)
hw_img = -(-h // 32)
for sa in (64,):
    @jax.jit
    def prep(t, sa=sa):
        f, p = bitpack.pack_pair(t)
        dil, _ = bitpack._make_ops(h, w, 16)
        f = jax.lax.fori_loop(0, sa, lambda i, f: dil(f, p), f)
        fP = jnp.zeros((hwp, wp), jnp.uint32).at[:hw_img, :w].set(f)
        pP = jnp.zeros((hwp, wp), jnp.uint32).at[:hw_img, :w].set(p)
        return fP, pP

    fP, pP = prep(spiral)
    fP, pP = jax.block_until_ready(fP), jax.block_until_ready(pP)
    it0 = jax.block_until_ready(jnp.full((1,), sa, jnp.int32))
    cx = jax.jit(lambda f, p, it, sa=sa: mk._cont_xla(
        f, p, it[0], h=h, w=w, dilate_steps=16, max_iters=100))
    cx.__name__ = f"v_contxla_sa{sa}"
    t = device_time_us(cx, fP, pP, it0, passes=3)
    out[f"spiral_contxla_sa{sa}_us"] = round(sum(t.values()), 1)
    print(f"spiral_contxla_sa{sa}", out[f"spiral_contxla_sa{sa}_us"], flush=True)

# ---- flags LAST (first D2H degrades subsequent dispatch) -----------------
for sa in (12, 24, 48, 72):
    cfg = CannyConfig(height=2160, width=3840, hysteresis_scan_after=sa)
    flags = []
    for s in range(4):
        p = jax.device_put(
            jnp.transpose(make_scene(2160, 3840, seed=s), (2, 0, 1))
        )
        _, fl, _, _ = canny_mega(
            p, lo, hi, dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=sa, max_iters=cfg.max_hysteresis_iters,
        )
        flags.append(np.asarray(fl)[0].tolist())
    out[f"flags4k_sa{sa}"] = flags
    print(f"4k sa={sa}: escalate {sum(f[1] for f in flags)}/4, "
          f"rounds {[f[0] for f in flags]}", flush=True)

print(json.dumps(out))
