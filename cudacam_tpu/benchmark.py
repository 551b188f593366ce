"""Benchmark: full six-stage Canny pipeline latency on a 1080p frame.

Baseline: the reference CUDA app reports ~6 ms/frame for "the entire CUDA
process" on a GTX 1650 at 1080p (reference README.md:5; BASELINE.md).

Prints exactly ONE JSON line:
  {"metric": ..., "value": <ms/frame>, "unit": "ms", "vs_baseline": <speedup>}
vs_baseline > 1 means faster than the reference's 6 ms.

Measures device-resident input -> device-resident edge map (the reference's
6 ms likewise excludes capture; its display also stays on-GPU). Uses a
deterministic synthetic scene with realistic edge structure so hysteresis
does real propagation work.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

from cudacam_tpu.io.sources import make_scene

BASELINE_MS = 6.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cudacam_tpu import CannyConfig, CannyStage
    from cudacam_tpu.engine import CannyEngine

    h, w = 1080, 1920
    platform = jax.devices()[0].platform
    cfg = CannyConfig(height=h, width=w)
    engine = CannyEngine(cfg)
    try:
        engine.warmup()
    except Exception as e:  # pragma: no cover - compile-service hiccup
        # Fall back to the portable XLA backend rather than reporting nothing.
        print(f"warning: {engine.backend} backend failed to compile ({e}); "
              "falling back to xla", file=sys.stderr)
        engine = CannyEngine(CannyConfig(height=h, width=w, backend="xla"))
        engine.warmup()

    # Distinct device-resident frames, streamed back-to-back — the
    # reference's own number is per-frame processing time inside a live
    # streaming loop (README.md:5), display never leaving the GPU. No
    # device->host transfer happens anywhere in the measured path.
    n_stream = 16 if platform == "tpu" else 4
    frames = [
        jax.device_put(make_scene(h, w, seed=s)) for s in range(n_stream)
    ]
    for f in frames:  # warm every input's dispatch path
        out = engine.process(f)
    jax.block_until_ready(out)

    passes = 20 if platform == "tpu" else 3
    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        for f in frames:
            out = engine.process(f)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3 / n_stream)

    ms = statistics.median(times)
    print(
        json.dumps(
            {
                "metric": f"canny_1080p_stream_ms_per_frame_{platform}_{engine.backend}",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 3),
            }
        )
    )


def _stream_ms(engine, frames, passes: int, jax) -> float:
    for f in frames:
        out = engine.process(f)
    jax.block_until_ready(out)
    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        for f in frames:
            out = engine.process(f)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3 / len(frames))
    return statistics.median(times)


def full_table() -> None:
    """Extended benchmark table: streaming per backend, per-stage costs,
    batched multi-camera throughput (BASELINE.json config 4), and a 4K
    mega-frame — written to BENCH_TABLE.md and printed. The default
    single-line contract stays in main()."""
    import jax
    import jax.numpy as jnp

    from cudacam_tpu import CannyConfig, CannyStage
    from cudacam_tpu.engine import CannyEngine

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    passes = 12 if on_tpu else 2
    rows = []

    def add(name, ms, note=""):
        rows.append((name, ms, BASELINE_MS / ms if ms > 0 else float("inf"), note))
        print(f"  {name:44s} {ms:9.4f} ms   {BASELINE_MS/ms:8.1f}x  {note}")

    print(f"platform={platform}")
    h, w = 1080, 1920
    frames = [jax.device_put(make_scene(h, w, seed=s)) for s in range(8)]

    for backend in (("pallas", "xla") if on_tpu else ("xla",)):
        cfg = CannyConfig(height=h, width=w, backend=backend)
        eng = CannyEngine(cfg)
        eng.warmup()
        add(f"1080p stream ms/frame [{backend}]",
            _stream_ms(eng, frames, passes, jax))

    # Per-stage cumulative latencies (run-to-stage-k), default backend.
    cfg = CannyConfig(height=h, width=w)
    eng = CannyEngine(cfg)
    for stage in CannyStage:
        eng.warmup(stage)
        for f in frames:
            out = eng.process(f, stage)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(passes):
            for f in frames:
                out = eng.process(f, stage)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1e3 / (passes * len(frames))
        add(f"1080p to stage {stage.name:8s} [{eng.backend}]", ms)

    # Config 1: VGA grayscale frame (the reference's minimal workload).
    cfg_vga = CannyConfig(height=480, width=640, channels=1)
    eng_vga = CannyEngine(cfg_vga)
    fv = [jax.device_put(make_scene(480, 640, seed=s)[..., 0].copy())
          for s in range(8)]
    eng_vga.warmup()
    add("VGA (480x640) grayscale stream ms/frame",
        _stream_ms(eng_vga, fv, passes, jax))

    # Config 2: every intermediary stage buffer kept (process_all).
    eng_all = CannyEngine(cfg)
    frames_iter = frames[:4]
    for f in frames_iter:
        out = eng_all.process_all(f)
    jax.block_until_ready(out["hyster"])
    t0 = time.perf_counter()
    for _ in range(passes):
        for f in frames_iter:
            out = eng_all.process_all(f)
    jax.block_until_ready(out["hyster"])
    add("1080p all-stage outputs ms/frame",
        (time.perf_counter() - t0) * 1e3 / (passes * len(frames_iter)),
        "keeps every display buffer (README.md:22 analog)")

    # Config 3: kernel-size / norm variants.
    for ks, norm in ((3, "l2"), (7, "l2"), (5, "l1")):
        cfgv = CannyConfig(height=h, width=w, kernel_size=ks, norm=norm)
        engv = CannyEngine(cfgv)
        engv.warmup()
        add(f"1080p ks={ks} norm={norm} stream ms/frame",
            _stream_ms(engv, frames[:4], max(4, passes // 2), jax))

    # Batched multi-camera streams (config 4).
    for b in (4, 8):
        batch = jax.device_put(
            np.stack([make_scene(h, w, seed=100 + s) for s in range(b)])
        )
        eng = CannyEngine(cfg)
        eng.warmup(batch=b)
        jax.block_until_ready(eng.process(batch))
        t0 = time.perf_counter()
        for _ in range(passes):
            out = eng.process(batch)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1e3 / (passes * b)
        add(f"1080p batched x{b} ms/frame [{eng.backend}]", ms)

    # Mega-frames (the BASELINE.json north-star axis: scaling frame size).
    for (hm, wm, label, note) in (
        (2160, 3840, "4K (2160x3840)", "4x the baseline's pixel count"),
        (4320, 7680, "8K (4320x7680)", "16x the baseline's pixel count"),
    ):
        cfgm = CannyConfig(height=hm, width=wm)
        engm = CannyEngine(cfgm)
        fm = [jax.device_put(make_scene(hm, wm, seed=s)) for s in range(2)]
        engm.warmup()
        add(f"{label} stream ms/frame",
            _stream_ms(engm, fm, max(4, passes // 3), jax), note)

    lines = [
        "# Benchmark table",
        "",
        f"Platform: {platform}. Baseline: reference CUDA app, ~6 ms/frame "
        "at 1080p on a GTX 1650 (its README).",
        "",
        "Note: single-stream rows are dominated by the per-dispatch host "
        "floor (~0.06-0.10 ms on this deployment) and bounce within noise "
        "across runs/backends; the batched rows expose actual kernel cost. "
        "See docs/performance.md for methodology.",
        "",
        "| Benchmark | ms/frame | vs 6 ms baseline | Note |",
        "|---|---|---|---|",
    ]
    for name, ms, speedup, note in rows:
        lines.append(f"| {name} | {ms:.4f} | {speedup:.1f}x | {note} |")
    with open("BENCH_TABLE.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote BENCH_TABLE.md")


def cli_entry() -> None:
    if "--full" in sys.argv:
        full_table()
    else:
        main()


if __name__ == "__main__":
    cli_entry()
