"""Device-time decomposition of the threshold sweep (run ON TPU).

BENCH_TABLE's weakest row is the K=16 sweep at ~2.75 ms — nominally
"1 FF pass + K hysteresis tails", yet 16 in-kernel tails should cost
~16 x ~0.10 ms = 1.6 ms plus a 0.075 ms FF pass. This probe isolates
where the rest goes so the batched-tail design targets the real costs:

  * feed_forward_nmsq alone (the shared threshold-independent pass)
  * one XLA thresh-map derivation from kg (per-k compare + select)
  * one fused-hysteresis tail on a ready thresh map
  * one COMPLETE tail (thresh map + hysteresis) as the sweep runs it
  * the full production sweep at K=16
  * the counts reduction over the (K, H, W) maps
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu.config import CannyConfig
from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops.pallas import canny as pallas_canny
from cudacam_tpu.ops.pallas.feedforward import feed_forward_nmsq
from cudacam_tpu.ops.pallas.hysteresis_fused import hysteresis_fused
from cudacam_tpu.stages import FINAL_EDGE
from tools.devtime import device_time_us

K = 16
H, W = 1080, 1920


def named(name, f):
    f.__name__ = name
    return jax.jit(f)


def main():
    cfg = CannyConfig(height=H, width=W)
    frame = jax.device_put(make_scene(H, W, seed=0))
    lows = np.linspace(5, 60, K).astype(np.int32)
    highs = np.linspace(20, 180, K).astype(np.int32)
    lo, hi = jnp.int32(10), jnp.int32(40)

    ff = named("p_ff_nmsq", lambda f: feed_forward_nmsq(
        jnp.transpose(f, (2, 0, 1)), kernel_size=cfg.kernel_size,
        grad_coeff=cfg.grad_coeff, norm=cfg.norm))
    kg = jax.block_until_ready(ff(frame))

    # Reuse the sweep's own thresh-map formula so the probe measures the
    # production derivation (scalar bounds, reference parity domain).
    from cudacam_tpu.ops import xla_ops

    # NOTE: this probe measures the 'reference' parity domain only (the
    # scalar-bound derivation below is that domain's thresh map; the
    # opencv domain differs only in the bound formula, not the cost
    # shape). Stage codes come from cudacam_tpu.stages so the probe can't
    # silently diverge from the production constants.
    from cudacam_tpu.stages import CANDIDATE_EDGE, NO_EDGE

    def thresh_from_kg(kg_, lo_, hi_):
        lo_b = xla_ops.threshold_magnitude_bound(lo_, cfg.grad_coeff, cfg.norm)
        hi_b = xla_ops.threshold_magnitude_bound(hi_, cfg.grad_coeff, cfg.norm)
        fin, cand = kg_ >= hi_b, kg_ >= lo_b
        return jnp.where(fin, jnp.uint8(FINAL_EDGE),
                         jnp.where(cand, jnp.uint8(CANDIDATE_EDGE),
                                   jnp.uint8(NO_EDGE)))

    tm = named("p_thresh_map", thresh_from_kg)
    thresh = jax.block_until_ready(tm(kg, lo, hi))

    hy = named("p_hyster_tail", lambda t: hysteresis_fused(
        t, max_iters=cfg.max_hysteresis_iters,
        dilate_steps=cfg.hysteresis_inner_steps,
        scan_after=cfg.hysteresis_scan_after))
    jax.block_until_ready(hy(thresh))

    full_tail = named("p_full_tail", lambda kg_, lo_, hi_: hysteresis_fused(
        thresh_from_kg(kg_, lo_, hi_),
        max_iters=cfg.max_hysteresis_iters,
        dilate_steps=cfg.hysteresis_inner_steps,
        scan_after=cfg.hysteresis_scan_after))
    jax.block_until_ready(full_tail(kg, lo, hi))

    sweep = named("p_sweep_k16", lambda f, ls, hs:
                  pallas_canny.threshold_sweep_pallas(f, ls, hs, cfg))
    maps, counts = jax.block_until_ready(sweep(frame, lows, highs))

    cnt = named("p_counts", lambda m: (m == np.uint8(FINAL_EDGE)).sum(
        axis=(1, 2)).astype(jnp.int32))
    jax.block_until_ready(cnt(maps))

    out = {}
    for label, fn, args in [
        ("ff_nmsq_us", ff, (frame,)),
        ("thresh_map_us", tm, (kg, lo, hi)),
        ("hyster_tail_us", hy, (thresh,)),
        ("full_tail_us", full_tail, (kg, lo, hi)),
        ("sweep_k16_us", sweep, (frame, lows, highs)),
        ("counts_us", cnt, (maps,)),
    ]:
        d = device_time_us(fn, *args)
        out[label] = round(sum(d.values()), 1)
    out["k_tails_predicted_us"] = round(
        out["ff_nmsq_us"] + K * out["full_tail_us"] + out["counts_us"], 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
