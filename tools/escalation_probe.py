"""Escalation-policy probe (VERDICT r3 weak #1) — run ON TPU.

The ks=3 1080p config measured 0.2365 ms/frame vs the 0.1187 headline:
ks=3 scenes routinely outgrow ``hysteresis_scan_after=12`` phase-1 rounds
and the engine then pays the TAKEN XLA phase-2 continuation (~658 us),
even though a phase-1 dilation round costs only ~5.2 us — two orders less.

CAVEAT (kept for the record): the per-config STREAM rows below are
invalid — the 8 chained pipeline calls inside one jit return only the
last result, so XLA dead-code-eliminates the first 7 (the rows measure
one frame). escalation_probe2.py re-measures streams with one dispatch
per frame; THIS probe's valid outputs are the flags (phase-1 exit
rounds / escalate frequency) and the spiral continuation costs.

This probe measures, on the 8-scene bench stream:
  * per-config mega_pipeline device time at a sweep of scan_after values
    (ks=3 and ks=5);
  * the 1080p spiral worst case (direct fused kernel AND through the
    mega pipeline) at the same scan_after values — raising scan_after
    shortens the adversarial ceiling too, because the cap (100) then
    truncates the EXPENSIVE phase-2 rounds, not the cheap phase-1 ones;
  * LAST (D2H degrades later dispatches on this deployment): each scene's
    phase-1 exit flags (rounds used, still-growing) per scan_after, i.e.
    the measured escalate frequency the policy should be keyed on.
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
from cudacam_tpu.ops.pallas.hysteresis_fused import hysteresis_fused
from cudacam_tpu.ops.pallas.megakernel import canny_mega, canny_mega_pipeline
from tools.devtime import device_time_us

h, w = 1080, 1920
lo, hi = np.int32(10), np.int32(40)
SCAN_AFTER = (12, 24, 48, 72)
frames = [
    jax.block_until_ready(
        jax.device_put(jnp.transpose(make_scene(h, w, seed=s), (2, 0, 1)))
    )
    for s in range(8)
]
spiral = jax.block_until_ready(jax.device_put(jnp.asarray(make_spiral_thresh(h, w))))
out = {}


def stream_fn(ks, sa, cont):
    cfg = CannyConfig(height=h, width=w, kernel_size=ks, hysteresis_scan_after=sa)

    def f(*ps):
        r = None
        for p in ps:
            r = canny_mega_pipeline(
                p, lo, hi, kernel_size=ks,
                dilate_steps=cfg.hysteresis_inner_steps, scan_after=sa,
                max_iters=cfg.max_hysteresis_iters, cont=cont,
            )
        return r

    f.__name__ = f"v_ks{ks}_sa{sa}_{cont}"
    return jax.jit(f)


for ks in (3, 5):
    for sa in SCAN_AFTER:
        for cont in (("xla",) if sa != 48 else ("xla", "pallas")):
            fn = stream_fn(ks, sa, cont)
            try:
                t = device_time_us(fn, *frames, passes=4)
            except Exception as e:
                out[f"ks{ks}_sa{sa}_{cont}"] = f"FAILED: {str(e)[:120]}"
                print(f"ks{ks}_sa{sa}_{cont}", out[f"ks{ks}_sa{sa}_{cont}"], flush=True)
                continue
            per_frame = sum(t.values()) / 8
            out[f"ks{ks}_sa{sa}_{cont}_us_per_frame"] = round(per_frame, 1)
            print(f"ks{ks} sa={sa} cont={cont}: {per_frame:.1f} us/frame", flush=True)

# Spiral worst case, three views per scan_after:
#   * the direct fused kernel (both phases in-kernel);
#   * the TAKEN continuations (XLA and Pallas forms) resumed from a
#     phase-1-exited spiral state — i.e. exactly what the engine pays after
#     the megakernel exports, without needing a spiral-producing image.
from cudacam_tpu.ops import bitpack
from cudacam_tpu.ops.pallas import megakernel as mk

_, _, hwp, wp = mk._mega_geometry(h, w)
hw_img = -(-h // 32)


def prep_state(sa):
    @jax.jit
    def prep(t):
        f, p = bitpack.pack_pair(t)
        dil, _ = bitpack._make_ops(h, w, 16)
        f = jax.lax.fori_loop(0, sa, lambda i, f: dil(f, p), f)
        fP = jnp.zeros((hwp, wp), jnp.uint32).at[:hw_img, :w].set(f)
        pP = jnp.zeros((hwp, wp), jnp.uint32).at[:hw_img, :w].set(p)
        return fP, pP

    fP, pP = prep(spiral)
    return (jax.block_until_ready(fP), jax.block_until_ready(pP),
            jax.block_until_ready(jnp.full((1,), sa, jnp.int32)))


for sa in (12, 48, 72):
    fk = jax.jit(lambda t, sa=sa: hysteresis_fused(t, max_iters=100, scan_after=sa))
    fk.__name__ = f"v_spiral_fused_sa{sa}"
    try:
        t1 = device_time_us(fk, spiral, passes=3)
        out[f"spiral_fused_sa{sa}_us"] = round(sum(t1.values()), 1)
    except Exception as e:
        out[f"spiral_fused_sa{sa}_us"] = f"FAILED: {str(e)[:120]}"
    fP, pP, it0 = prep_state(sa)

    cx = jax.jit(lambda f, p, it, sa=sa: mk._cont_xla(
        f, p, it[0], h=h, w=w, dilate_steps=16, max_iters=100))
    cx.__name__ = f"v_contxla_sa{sa}"
    cp = jax.jit(lambda f, p, it, sa=sa: mk._cont_call(
        f, p, it, h=h, w=w, hwp=hwp, wp=wp, dilate_steps=16, max_iters=100)[0])
    cp.__name__ = f"v_contpl_sa{sa}"
    for nm, fn in (("contxla", cx), ("contpl", cp)):
        try:
            t2 = device_time_us(fn, fP, pP, it0, passes=3)
            out[f"spiral_{nm}_sa{sa}_us"] = round(sum(t2.values()), 1)
        except Exception as e:
            out[f"spiral_{nm}_sa{sa}_us"] = f"FAILED: {str(e)[:120]}"
    print(f"spiral sa={sa}: fused={out[f'spiral_fused_sa{sa}_us']} "
          f"contxla={out[f'spiral_contxla_sa{sa}_us']} "
          f"contpl={out[f'spiral_contpl_sa{sa}_us']}", flush=True)

# ---- flags LAST (first D2H degrades subsequent dispatch) -----------------
for ks in (3, 5):
    cfg = CannyConfig(height=h, width=w, kernel_size=ks)
    for sa in SCAN_AFTER:
        flags = []
        for p in frames:
            _, fl, _, _ = canny_mega(
                p, lo, hi, kernel_size=ks,
                dilate_steps=cfg.hysteresis_inner_steps, scan_after=sa,
                max_iters=cfg.max_hysteresis_iters,
            )
            flags.append(np.asarray(fl)[0].tolist())
        out[f"ks{ks}_sa{sa}_flags"] = flags
        n_esc = sum(f[1] for f in flags)
        print(f"ks{ks} sa={sa}: escalate {n_esc}/8, rounds "
              f"{[f[0] for f in flags]}", flush=True)

print(json.dumps(out))
