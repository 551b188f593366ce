"""Per-phase amortized device timing of the Pallas pipeline (run ON TPU).

Methodology (see docs/performance.md): a jitted ``lax.scan`` over K distinct
device-resident frames amortizes the ~60-80 us per-dispatch host floor of
this deployment, exposing true device cost per frame. Each phase subset is
timed as its own scan; differences between cumulative subsets attribute time
to phases. Every step's output is folded into a carried checksum so XLA can
neither DCE a stage nor hoist the body.

Usage: python tools/amortized_profile.py [--frames K] [--passes N]
Prints one JSON line with per-phase us/frame.
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu import CannyConfig
from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage
from cudacam_tpu.ops.pallas.hysteresis import hysteresis_pallas
from cudacam_tpu.stages import CannyStage


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--passes", type=int, default=30)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    h, w = args.height, args.width
    cfg = CannyConfig(height=h, width=w)
    frames = jax.device_put(
        np.stack([make_scene(h, w, seed=s) for s in range(args.frames)])
    )
    lo = jnp.int32(cfg.low_threshold)
    hi = jnp.int32(cfg.high_threshold)

    def mono_only(f):
        return xla_ops.rgb2mono(f)

    def ff(f, stage):
        return feed_forward_to_stage(
            xla_ops.rgb2mono(f), lo, hi,
            kernel_size=cfg.kernel_size, grad_coeff=cfg.grad_coeff,
            norm=cfg.norm, parity=cfg.parity, out_stage=stage,
        )

    def full(f):
        return hysteresis_pallas(
            ff(f, CannyStage.THRESH), max_iters=cfg.max_hysteresis_iters
        )

    phases = {
        "mono": mono_only,
        "mono+gauss": lambda f: ff(f, CannyStage.GAUSSIAN),
        "mono+ff_thresh": lambda f: ff(f, CannyStage.THRESH),
        "full": full,
    }

    def make_scan(fn):
        @jax.jit
        def run(fr):
            def step(acc, f):
                out = fn(f)
                return acc + jnp.sum(out.astype(jnp.int32)), None

            acc, _ = jax.lax.scan(step, jnp.int32(0), fr)
            return acc

        return run

    results = {}
    for name, fn in phases.items():
        run = make_scan(fn)
        out = run(frames)
        jax.block_until_ready(out)  # compile + warm
        times = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            out = run(frames)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) * 1e6 / args.frames)
        results[name] = round(statistics.median(times), 2)

    mp = h * w / 1e6
    results["attribution_us"] = {
        "mono": results["mono"],
        "gauss_kernel": round(results["mono+gauss"] - results["mono"], 2),
        "ff_tail(sobel+nms+thresh)": round(
            results["mono+ff_thresh"] - results["mono+gauss"], 2
        ),
        "hysteresis": round(results["full"] - results["mono+ff_thresh"], 2),
    }
    results["meta"] = {"h": h, "w": w, "mp": mp, "frames": args.frames}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
