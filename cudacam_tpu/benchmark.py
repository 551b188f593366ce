"""Benchmark: full six-stage Canny pipeline cost on a 1080p frame.

Baseline: the reference CUDA app reports ~6 ms/frame for "the entire CUDA
process" on a GTX 1650 at 1080p (reference README.md:5; BASELINE.md).

Prints exactly ONE JSON line:
  {"metric": ..., "value": <ms/frame>, "unit": "ms", "vs_baseline": <speedup>}
vs_baseline > 1 means faster than the reference's 6 ms.

Methodology (docs/performance.md): on this deployment the TPU sits behind a
tunnel whose ``block_until_ready`` acknowledges before device execution
completes, so WALL CLOCKS ARE NOT TRUSTWORTHY in either direction. The
headline value is therefore the XProf device-lane busy time per frame
(hardware timestamps; verified against a known-FLOPs matmul at chip peak),
measured over a streaming loop of distinct device-resident frames. On CPU
(no device lane) the wall clock is honest and is used directly. No
device->host transfer of image data happens anywhere in the measured path
(readback also degrades the tunnel permanently).
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

from cudacam_tpu.io.sources import make_scene, make_spiral_thresh

BASELINE_MS = 6.0


def _wall_ms(run_once, passes: int, frames_per_pass: int) -> float:
    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        run_once()
        times.append((time.perf_counter() - t0) * 1e3 / frames_per_pass)
    return statistics.median(times)


def _measure_ms_per_frame(run_once, n_frames: int, on_tpu: bool,
                          passes: int = 4) -> tuple:
    """(device_ms, wall_ms) per frame for one warm streaming pass."""
    import jax

    from cudacam_tpu.utils.devtime import device_time_ms_per_call

    jax.block_until_ready(run_once())  # warm once more
    wall = _wall_ms(run_once, max(2, passes - 1), n_frames)
    dev = None
    if on_tpu:
        dev = device_time_ms_per_call(run_once, calls=passes)
        if dev is not None:
            dev /= n_frames
    return dev, wall


def main() -> None:
    import jax

    from cudacam_tpu import CannyConfig
    from cudacam_tpu.engine import CannyEngine

    h, w = 1080, 1920
    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
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
    # streaming loop (README.md:5), display never leaving the GPU.
    n_stream = 8 if on_tpu else 4
    frames = [
        jax.device_put(make_scene(h, w, seed=s)) for s in range(n_stream)
    ]

    def run_once():
        out = None
        for f in frames:
            out = engine.process(f)
        jax.block_until_ready(out)
        return out

    run_once()  # warm every input's dispatch path
    dev, wall = _measure_ms_per_frame(
        run_once, n_stream, on_tpu, passes=6 if on_tpu else 3
    )
    if dev is not None:
        ms, kind = dev, "device"
    else:
        ms, kind = wall, "wall"
    print(
        json.dumps(
            {
                "metric": (
                    f"canny_1080p_{kind}_ms_per_frame_"
                    f"{platform}_{engine.backend}"
                ),
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 3),
            }
        )
    )


def full_table() -> None:
    """Extended benchmark table — device-time and wall columns per row —
    written to BENCH_TABLE.md and printed. The single-line driver contract
    stays in main()."""
    import jax
    import jax.numpy as jnp

    from cudacam_tpu import CannyConfig, CannyStage
    from cudacam_tpu.engine import CannyEngine
    from cudacam_tpu.ops.bitpack import hysteresis_packed

    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    rows = []

    def add(name, dev_ms, wall_ms, note=""):
        ms = dev_ms if dev_ms is not None else wall_ms
        rows.append((name, dev_ms, wall_ms, BASELINE_MS / ms, note))
        d = f"{dev_ms:9.4f}" if dev_ms is not None else "      n/a"
        print(f"  {name:44s} dev={d} wall={wall_ms:9.4f} ms "
              f"{BASELINE_MS/ms:8.1f}x  {note}", flush=True)

    def bench_engine(eng, frames, name, note="", stage=None, passes=4):
        def run_once():
            out = None
            for f in frames:
                out = (eng.process(f) if stage is None
                       else eng.process(f, stage))
            jax.block_until_ready(out)
        run_once()
        dev, wall = _measure_ms_per_frame(
            run_once, len(frames), on_tpu, passes=passes)
        add(name, dev, wall, note)

    print(f"platform={platform}")
    h, w = 1080, 1920
    frames = [jax.device_put(make_scene(h, w, seed=s)) for s in range(8)]

    for backend in (("pallas", "xla") if on_tpu else ("xla",)):
        cfg = CannyConfig(height=h, width=w, backend=backend)
        eng = CannyEngine(cfg)
        eng.warmup()
        bench_engine(eng, frames, f"1080p stream ms/frame [{backend}]")

    # Per-stage cumulative (run-to-stage-k), default backend.
    cfg = CannyConfig(height=h, width=w)
    eng = CannyEngine(cfg)
    for stage in CannyStage:
        eng.warmup(stage)
        bench_engine(eng, frames, f"1080p to stage {stage.name:8s} [{eng.backend}]",
                     stage=stage)

    # Config 1: VGA grayscale frame (the reference's minimal workload).
    cfg_vga = CannyConfig(height=480, width=640, channels=1)
    eng_vga = CannyEngine(cfg_vga)
    fv = [jax.device_put(make_scene(480, 640, seed=s)[..., 0].copy())
          for s in range(8)]
    eng_vga.warmup()
    bench_engine(eng_vga, fv, "VGA (480x640) grayscale stream ms/frame")

    # Config 2: every intermediary stage buffer kept (process_all).
    eng_all = CannyEngine(cfg)
    frames4 = frames[:4]

    def run_all():
        out = None
        for f in frames4:
            out = eng_all.process_all(f)
        jax.block_until_ready(out["hyster"])
    run_all()
    dev, wall = _measure_ms_per_frame(run_all, len(frames4), on_tpu)
    add("1080p all-stage outputs ms/frame", dev, wall,
        "keeps every display buffer (README.md:22 analog)")

    # Config 3: kernel-size / norm variants.
    for ks, norm in ((3, "l2"), (7, "l2"), (5, "l1")):
        cfgv = CannyConfig(height=h, width=w, kernel_size=ks, norm=norm)
        engv = CannyEngine(cfgv)
        engv.warmup()
        bench_engine(engv, frames[:4],
                     f"1080p ks={ks} norm={norm} stream ms/frame")

    # Batched multi-camera streams (config 4). Scene-controlled (VERDICT
    # r3 #5): the fixed-scene rows replicate ONE frame so they measure
    # BATCHING, not scene mix — expected flat vs the single-frame row
    # (one 1080p frame already saturates the chip's VPU; batching
    # amortizes dispatch only). One mixed-scene row is kept for the
    # realistic multi-camera load, where per-frame convergence depth
    # varies with content. The seed-0 SINGLE-frame row is the
    # like-for-like baseline for the batch rows' overhead note (VERDICT
    # r4 weak #2: the 8-scene stream is not convergence-depth-comparable).
    f0 = jax.device_put(make_scene(h, w, seed=0))
    eng0 = CannyEngine(cfg)
    eng0.warmup()
    seed0_single = {}

    def run_seed0():
        jax.block_until_ready(eng0.process(f0))
    run_seed0()
    dev, wall = _measure_ms_per_frame(run_seed0, 1, on_tpu)
    seed0_single["1080p"] = dev
    add("1080p single frame (seed 0) ms/frame", dev, wall,
        "same-session single-frame baseline for the batch rows below "
        "(same scene, same convergence depth)")

    def batch_note(label):
        base = seed0_single.get(label)
        if base is None:
            return "identical frames: measures batching itself"
        return ("identical frames: measures batching itself — ONE resident "
                "megakernel launch for the whole batch (grid over frames, "
                "r5 canny_mega_batched; the pre-r5 lax.map form paid ~16 "
                "us/frame more); compare the "
                f"{base:.4f} seed-0 single-frame row (like-for-like "
                "convergence depth) — the batch amortizes even the "
                "per-launch fixed cost, flat in B")

    for b, mixed in ((4, False), (8, False), (8, True)):
        fsrc = (
            [make_scene(h, w, seed=100 + s) for s in range(b)]
            if mixed
            else [make_scene(h, w, seed=0)] * b
        )
        batch = jax.device_put(np.stack(fsrc))
        engb = CannyEngine(cfg)
        engb.warmup(batch=b)

        def run_batch():
            jax.block_until_ready(engb.process(batch))
        run_batch()
        dev, wall = _measure_ms_per_frame(run_batch, b, on_tpu)
        tag = "mixed scenes" if mixed else "fixed scene"
        add(f"1080p batched x{b} ({tag}) ms/frame [{engb.backend}]", dev,
            wall,
            ("per-frame convergence depth varies with content; the "
             "fixed-scene rows above isolate the batching overhead itself"
             if mixed else batch_note("1080p")))

    # BASELINE config 4 LITERALLY: batched multi-camera 4K frames
    # (VERDICT r4 missing #2) — the unsharded batch axis, and the same
    # batch through build_sharded_pipeline on the on-chip degenerate of
    # "tile-partitioned across chips".
    cfg4k = CannyConfig(height=2160, width=3840)
    f0_4k = jax.device_put(make_scene(2160, 3840, seed=0))
    eng4k0 = CannyEngine(cfg4k)
    eng4k0.warmup()

    def run_seed0_4k():
        jax.block_until_ready(eng4k0.process(f0_4k))
    run_seed0_4k()
    dev, wall = _measure_ms_per_frame(run_seed0_4k, 1, on_tpu)
    seed0_single["4K"] = dev
    add("4K single frame (seed 0) ms/frame", dev, wall,
        "like-for-like baseline for the 4K batch rows")
    for b in (2, 4):
        batch4k = jax.device_put(
            np.stack([make_scene(2160, 3840, seed=0)] * b))
        engb4 = CannyEngine(cfg4k)
        engb4.warmup(batch=b)

        def run_b4():
            jax.block_until_ready(engb4.process(batch4k))
        run_b4()
        dev, wall = _measure_ms_per_frame(run_b4, b, on_tpu)
        add(f"4K batched x{b} (fixed scene) ms/frame [{engb4.backend}]",
            dev, wall, batch_note("4K"))

    # Threshold sweep (BASELINE.json config 3): K (low, high) pairs in one
    # compiled program — on the pallas backend this is ONE resident-kg
    # kernel launch for all K tails, with r5's monotone warm-start
    # (each pair seeds from its dominating predecessor's converged
    # plane; ops/pallas/canny.py). 8K sweeps fall back to the XLA loop
    # per pair (the fused kernels are past the VMEM budget there —
    # documented policy, ops/pallas/canny._SWEEP_UNROLL_MAX branch).
    K = 16
    lows_s = np.linspace(5, 60, K).astype(np.int32)
    highs_s = np.linspace(20, 180, K).astype(np.int32)
    for label, cfg_sw, fr_sw in (
        ("1080p", cfg, frames[0]),
        ("4K", CannyConfig(height=2160, width=3840),
         jax.device_put(make_scene(2160, 3840, seed=0))),
    ):
        eng_sw = CannyEngine(cfg_sw)

        def run_sweep():
            jax.block_until_ready(
                eng_sw.threshold_sweep(fr_sw, lows_s, highs_s))
        run_sweep()
        dev, wall = _measure_ms_per_frame(run_sweep, 1, on_tpu)
        add(f"{label} threshold sweep K={K} [{eng_sw.backend}]", dev, wall,
            "one resident-kg launch, monotone-seeded tails "
            "(r5: 1.54 -> 1.17 ms at 1080p); 8K falls back to the XLA "
            "loop per pair (kernel VMEM policy)")

    # Worst-case hysteresis: a frame-long spiral candidate chain (the cap /
    # propagation stress; reference analog is its 100-relaunch belt).
    spiral = jax.device_put(jnp.asarray(make_spiral_thresh(h, w)))
    if on_tpu:
        from cudacam_tpu.ops.pallas.hysteresis_fused import hysteresis_fused

        hyst = jax.jit(lambda t: hysteresis_fused(
            t, max_iters=100, scan_after=cfg.hysteresis_scan_after))
    else:
        hyst = jax.jit(lambda t: hysteresis_packed(
            t, max_iters=100, scan_after=cfg.hysteresis_scan_after))

    def run_spiral():
        jax.block_until_ready(hyst(spiral))
    run_spiral()
    dev, wall = _measure_ms_per_frame(run_spiral, 1, on_tpu)
    add("hysteresis worst case (1080p spiral)", dev, wall,
        "single ~1M-px chain; cap-bounded (docs/parity.md). The derived "
        "scan_after=64 default truncates the EXPENSIVE scan rounds at "
        "the 100-round cap (r3's sa=12 row was 2.08 ms). An "
        "adversarial-input ceiling, not scene behavior "
        "(docs/performance.md)")

    # Worst case through the PRODUCTION ENGINE (r5): make_spiral_frame is
    # a real adversarial IMAGE (a candidate-band spiral ridge with one
    # seed blob) that forces the megakernel's phase-boundary export and a
    # TAKEN phase-2 continuation — both continuation forms priced
    # (VERDICT r4 #7), plus the 8K escalation cliff (VERDICT r4 #3/#5:
    # the 8K scan kernel does not compile, so 8K phase 2 IS the XLA
    # continuation — this row prices that path end to end).
    from cudacam_tpu.io.sources import make_spiral_frame

    if on_tpu:
        sp1080 = jax.device_put(make_spiral_frame(h, w))
        for cont in ("xla", "pallas"):
            eng_wc = CannyEngine(CannyConfig(height=h, width=w,
                                             continuation=cont))
            eng_wc.warmup()

            def run_wc():
                jax.block_until_ready(eng_wc.process(sp1080))
            run_wc()
            dev, wall = _measure_ms_per_frame(run_wc, 1, on_tpu)
            add(f"1080p worst case through engine [cont={cont}]", dev,
                wall,
                "real adversarial image -> megakernel + TAKEN phase-2 "
                "continuation; cont='pallas' is the CannyConfig opt-in "
                "for cap-class streams (12 us/frame untaken-branch tax "
                "on scenes, ~3x cheaper taken phase 2)")

        sp4k = jax.device_put(make_spiral_frame(2160, 3840))
        eng_wc4 = CannyEngine(CannyConfig(height=2160, width=3840))
        eng_wc4.warmup()

        def run_wc4():
            jax.block_until_ready(eng_wc4.process(sp4k))
        run_wc4()
        dev, wall = _measure_ms_per_frame(run_wc4, 1, on_tpu, passes=3)
        add("4K worst case through engine", dev, wall,
            "cap-class 4K input: megakernel phase 1 + the taken Pallas "
            "continuation (the 4K auto form) to the 100-round cap")

        sp8k = jax.device_put(make_spiral_frame(4320, 7680))
        eng_wc8 = CannyEngine(CannyConfig(height=4320, width=7680))
        eng_wc8.warmup()

        def run_wc8():
            jax.block_until_ready(eng_wc8.process(sp8k))
        run_wc8()
        dev, wall = _measure_ms_per_frame(run_wc8, 1, on_tpu, passes=3)
        add("8K worst case through engine (escalation cliff)", dev, wall,
            "cap-class 8K input: megakernel phase 1 + the taken "
            "COLUMN-SPLIT continuation (r5: 4K-class slices + seam "
            "rounds under a total-round budget; the monolithic 8K scan "
            "kernel never compiles, and the r4-era XLA form measured "
            "38.94 ms on this input). Prices the reference's "
            "100-relaunch worst case at 16x the pixels "
            "(cannyEdgeH.cu:297-338)")

    # Sharded path (BASELINE >=80% scaling target; no pod attached — see
    # the Sharded section writer): the measurable single-chip piece is the
    # shard_map framework overhead, a 1x1x1 mesh vs the unsharded engine.
    sharded_lines = []
    if on_tpu:
        try:
            from cudacam_tpu.parallel import build_sharded_pipeline, make_mesh
            from cudacam_tpu.parallel.sharded import shard_frame

            mesh1 = make_mesh(batch=1, rows=1, cols=1, devices=jax.devices()[:1])
            lo1, hi1 = jnp.int32(10), jnp.int32(40)
            # Overhead at 1080p AND at the mega-frame sizes sharding
            # exists for (the N-chip projection's per-chip baselines).
            # Each row streams the SAME scene set as its unsharded
            # counterpart, so the rows divide cleanly.
            shard_cases = [
                ("1080p", cfg, frames),
                ("4K", CannyConfig(height=2160, width=3840),
                 [jax.device_put(make_scene(2160, 3840, seed=s))
                  for s in range(2)]),
                ("8K", CannyConfig(height=4320, width=7680),
                 [jax.device_put(make_scene(4320, 7680, seed=s))
                  for s in range(2)]),
            ]
            for label, cfg_s, frs in shard_cases:
                run1 = build_sharded_pipeline(cfg_s, mesh1, backend="pallas")
                fss = [shard_frame(fr[None], mesh1) for fr in frs]

                def run_sh(run1=run1, fss=fss):
                    out = None
                    for fs in fss:
                        out = run1(fs, lo1, hi1)
                    jax.block_until_ready(out)
                run_sh()
                dev, wall = _measure_ms_per_frame(run_sh, len(fss), on_tpu)
                add(f"{label} shard_map 1x1x1 mesh [pallas]", dev, wall,
                    "sharded-framework overhead vs the unsharded stream "
                    "row (same scene set): one export-mode megakernel "
                    "launch (FF + pack + phase-1), the packed round loop "
                    "(converged tiles run ZERO extra saturate rounds — "
                    "the loop exits on the psum of "
                    "still-growing|new-halo-bits), one unpack kernel; a "
                    "1-shard mesh axis carries zero halo slots")

            # BASELINE config 4's literal on-chip degenerate: a BATCH of
            # 4K frames through the sharded pipeline's b axis.
            cfg_s4 = CannyConfig(height=2160, width=3840)
            run_b = build_sharded_pipeline(cfg_s4, mesh1, backend="pallas")
            fb = shard_frame(
                np.stack([make_scene(2160, 3840, seed=0)] * 2), mesh1)
            fb = jax.block_until_ready(fb)

            def run_shb():
                jax.block_until_ready(run_b(fb, lo1, hi1))
            run_shb()
            dev, wall = _measure_ms_per_frame(run_shb, 2, on_tpu)
            add("4K batched x2 shard_map 1x1x1 mesh [pallas]", dev, wall,
                "config 4 literally (batched multi-camera 4K through "
                "build_sharded_pipeline's b axis, on-chip degenerate "
                "mesh): local batch iterates via lax.map inside the "
                "sharded program; compare the unsharded 4K batch row")
        except Exception as e:  # pragma: no cover - compile-service hiccup
            print(f"  sharded 1x1x1 row skipped: {e}", file=sys.stderr)

    # Mega-frames (the BASELINE.json north-star axis: scaling frame size).
    for (hm, wm, label, note) in (
        (2160, 3840, "4K (2160x3840)", "4x the baseline's pixel count"),
        (4320, 7680, "8K (4320x7680)", "16x the baseline's pixel count"),
    ):
        cfgm = CannyConfig(height=hm, width=wm)
        engm = CannyEngine(cfgm)
        fm = [jax.device_put(make_scene(hm, wm, seed=s)) for s in range(2)]
        engm.warmup()
        bench_engine(engm, fm, f"{label} stream ms/frame", note=note)

    def row_dev(substr):
        r = next((r for r in rows if substr in r[0] and r[1] is not None),
                 None)
        return r[1] if r else None

    sharded_lines = _sharded_section({
        "1080p_stream_ms": row_dev("1080p stream ms/frame [pallas]"),
        "4K_stream_ms": row_dev("4K (2160x3840) stream"),
        "8K_stream_ms": row_dev("8K (4320x7680) stream"),
        "1080p_batch8_ms": row_dev("1080p batched x8 (fixed scene)"),
        "4K_batch4_ms": row_dev("4K batched x4"),
    })

    lines = [
        "# Benchmark table",
        "",
        f"Platform: {platform}. Baseline: reference CUDA app, ~6 ms/frame "
        "at 1080p on a GTX 1650 (its README).",
        "",
        "`dev` is XProf device-lane busy time per frame (hardware "
        "timestamps — the honest metric on this tunneled deployment; "
        "see docs/performance.md). `wall` is host wall-clock, reported "
        "for reference only: the tunnel acknowledges readiness before "
        "execution completes, so wall times can under- OR over-state "
        "device cost arbitrarily. The `vs` column divides the UNSCALED "
        "6 ms 1080p baseline; mega-frame rows process 4x/16x the pixels "
        "(multiply accordingly for per-pixel comparisons), and the spiral "
        "row is a worst-case input no natural scene produces.",
        "",
        "| Benchmark | device ms/frame | wall ms/frame | vs 6 ms baseline | Note |",
        "|---|---|---|---|---|",
    ]
    for name, dev_ms, wall_ms, speedup, note in rows:
        d = f"{dev_ms:.4f}" if dev_ms is not None else "n/a"
        lines.append(
            f"| {name} | {d} | {wall_ms:.4f} | {speedup:.1f}x | {note} |"
        )

    # Roofline appendix (VERDICT r1: publish achieved GB/s vs chip peak).
    mono_row = next((r for r in rows if "stage MONO" in r[0] and r[1]), None)
    if mono_row is not None:
        mono_ms = mono_row[1]
        traffic_mb = (h * w * 3 + (h + 16) * 2176) / 1e6  # BGR read + padded mono write
        gbs = traffic_mb / 1e3 / (mono_ms / 1e3)
        full_row = next((r for r in rows if "stream ms/frame [pallas]" in r[0]
                         and r[1]), None)
        lines += [
            "",
            "## Roofline (1080p, measured)",
            "",
            f"- mono+pad pass: {traffic_mb:.1f} MB in {mono_ms*1e3:.1f} us "
            f"= **{gbs:.0f} GB/s achieved** (v5e HBM peak ~819 GB/s -> "
            f"{100*gbs/819:.0f}% — an elementwise u8 pass is near the bound).",
        ]
        if full_row is not None:
            tot_mb = (h * w * 3 + h * w) / 1e6  # raw frame read + edge write
            lines += [
                f"- megakernel (whole pipeline): HBM touched twice — "
                f"{tot_mb:.1f} MB total in {full_row[1]*1e3:.0f} us ≈ "
                f"{tot_mb/1e3/(full_row[1]/1e3):.0f} GB/s. Deliberately far "
                "from the HBM bound: the frame is read ONCE and every "
                "intermediate (mono, blur, gradients, NMS, thresholds, "
                "packed hysteresis state) lives and dies in VMEM, so the "
                "chain is VPU-bound on its ~45 vector ops/pixel "
                "(docs/performance.md's op inventory), not bandwidth-bound "
                "like the reference's 14-round-trip kernel chain.",
            ]
        lines += [
            "- fused feed-forward kernel: DMA floor measured at ~9 us "
            "(copy-only kernel variant); the full chain is VPU-bound on "
            "stencil rolls, not HBM-bound (per-op roll costs in "
            "docs/performance.md).",
            "- bit-packed hysteresis: the whole state (~260 KB) lives in "
            "VMEM; rounds are VPU-bound at ~0.8 us per bit-parallel "
            "dilation (32 px/lane).",
        ]
    lines += sharded_lines
    with open("BENCH_TABLE.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote BENCH_TABLE.md")


def _sharded_section(anchors: dict) -> list:
    """Markdown lines for BENCH_TABLE.md's Sharded section: the virtual
    8-device mesh's collective inventory (subprocess: needs the CPU
    platform + forced host device count before jax init) plus the N-chip
    projection keyed on the MEMBER-TILE measured constants
    (MEMBER_TILE.json, tools/member_tile_probe.py — r5: the projection's
    per-chip baseline is the real multi-shard member program measured on
    the single chip, not the degenerate 1x1x1 row)."""
    import subprocess

    probe = {}
    try:
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        r = subprocess.run(
            [sys.executable, os.path.join("tools", "sharded_virtual_probe.py")],
            capture_output=True, text=True, timeout=900, env=env,
        )
        if r.returncode == 0 and r.stdout.strip():
            probe = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:  # pragma: no cover
        print(f"  sharded virtual probe skipped: {e}", file=sys.stderr)
    member = {}
    try:
        # Repo-root-relative (the probe writes it there via __file__):
        # a CWD-relative open silently drops the whole projection when
        # the bench runs from another directory (review catch).
        _mt = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "MEMBER_TILE.json",
        )
        with open(_mt) as fh:
            member = json.load(fh)
    except Exception as e:  # pragma: no cover
        print(f"  MEMBER_TILE.json unavailable: {e}", file=sys.stderr)
    lines = [
        "",
        "## Sharded (multi-chip design, measured constants)",
        "",
        "No TPU pod is attached to this deployment; the sharded path is "
        "validated functionally on 8-device virtual CPU meshes and a real "
        "2/4-process `jax.distributed` cluster (tests/test_distributed.py). "
        "The measurable pieces:",
        "",
    ]
    if probe:
        lines += [
            f"- **Collective inventory** (compiled HLO, {probe['mesh']}, "
            f"{probe['frame']} frame = {probe['local_tile']} tiles): "
            f"**{probe['ff_collective_permutes_per_frame']} collective-"
            "permutes ONCE per frame cover every feed-forward stage** "
            "(2 per mesh axis — the one-exchange claim, verified "
            "numerically), then "
            f"{probe['hyster_collective_permutes_per_round']} permutes + "
            f"{probe['hyster_allreduces_per_round']} all-reduce per "
            "hysteresis round at "
            f"{probe['hyster_halo_bytes_per_round'] / 1e3:.1f} KB of halo "
            f"per round ({probe['hysteresis_halo_px']} px deep).",
            f"- **Collective rounds to converge**: "
            f"{probe['scene_collective_rounds']} on the benchmark scene; "
            f"{probe['snake_collective_rounds']} on an adversarial "
            "cross-shard snake (a candidate rectangle threading all 8 "
            "tiles from one seed).",
        ]
    lines += [
        "- **Framework overhead on the real chip**: the `shard_map 1x1x1` "
        "row above vs the unsharded stream row (r4: 1.005-1.02x; a "
        "1-shard mesh axis carries zero halo slots, so the degenerate "
        "mesh runs the plain megakernel geometry + one unpack kernel).",
        "",
        "### Member-tile measured constants (r5, single real chip)",
        "",
        "`tools/member_tile_probe.py` runs the EXACT per-shard program a "
        "real (ny, nx) member executes — raw-tile extension concats, "
        "export megakernel with traced origin + pollution ring, entry "
        "exchanges, R collective rounds of the real strip "
        "extraction/placement arithmetic + injected local saturate, "
        "unpack — with only the ppermute wire hops substituted "
        "(optimization barriers; wire modeled separately below):",
        "",
        "| Member | tile | R=0 | +1 round | +5 rounds | per round |",
        "|---|---|---|---|---|---|",
    ]
    per_round = {}
    for name in ("1080p_2x2", "1080p_1x2", "4K_2x2"):
        m = member.get(name)
        if not m:
            continue
        best = {}
        for kind in ("pallas", "xla"):
            r = m.get(kind, {})
            if "0" in r and "5" in r:
                best[kind] = r
        kind = min(best, key=lambda k: best[k]["5"]) if best else None
        if kind is None:
            continue
        r = best[kind]
        slope = (r["5"] - r["0"]) / 5
        per_round[name] = (r, slope, kind)
        r1 = f"{r['1']:.0f} us" if "1" in r else "—"
        lines.append(
            f"| {name} ({kind} saturate) | {m['info']['tile']} | "
            f"{r['0']:.0f} us | {r1} | "
            f"{r['5']:.0f} us | ~{slope:.0f} us |"
        )
    lines += [
        "",
        "Decomposition of the 1080p 2x2 member's R=0 floor "
        "(tools/member_decomp_probe.py): extension concats 19.1 us, "
        "export megakernel 85.6 us with traced origin + ring (69.5 "
        "static — a 16.1 us traced-origin tax at member tiles), unpack "
        "2.0 us, solo saturate launch 5.6 us. The megakernel carries "
        "~52 us of size-independent cost (105 us at the full 2.07 Mpx "
        "frame vs 69.5 at the 0.70 Mpx member, static form).",
        "",
        "### N-chip projection from member constants",
        "",
    ]
    # Wire model: v5e ICI ~45 GB/s/link, ~1 us/collective latency class.
    # Per round: 4 permutes + 1 psum, strips ~20-36 KB -> latency-bound,
    # ~5 us/round; FF raw-strip extension exchange ~0.4-1.5 MB once ->
    # ~10-35 us.
    R_SCENE = probe.get("scene_collective_rounds", 5) if probe else 5
    wire_round = 5.0
    t1080 = (anchors.get("1080p_stream_ms") or 0.1189) * 1e3
    t4k = (anchors.get("4K_stream_ms") or 0.7159) * 1e3

    def eff(t1, member_us, n, ff_wire):
        tn = member_us + ff_wire + R_SCENE * wire_round
        return t1 / (n * tn) * 100, tn

    proj = []
    if "1080p_1x2" in per_round:
        r, s, k = per_round["1080p_1x2"]
        e, tn = eff(t1080, r["0"] + R_SCENE * s, 2, 10)
        proj.append(("1080p single stream", 2, tn, e))
    if "1080p_2x2" in per_round:
        r, s, k = per_round["1080p_2x2"]
        e, tn = eff(t1080, r["0"] + R_SCENE * s, 4, 10)
        proj.append(("1080p single stream", 4, tn, e))
        # 2x4 member: only ~8 us of the 2x2 member scales away with the
        # halved tile (the decomposition's marginal 25.5 us/Mpx x 0.3
        # Mpx); floor-dominated, so reuse the 2x2 member minus that.
        e, tn = eff(t1080, r["0"] - 8 + R_SCENE * s, 8, 10)
        proj.append(("1080p single stream", 8, tn, e))
    if "4K_2x2" in per_round:
        r, s, k = per_round["4K_2x2"]
        e, tn = eff(t4k, r["0"] + R_SCENE * s, 4, 35)
        proj.append(("4K single stream", 4, tn, e))
    if proj:
        lines += [
            "| Workload | N | per-chip us/frame | scaling efficiency |",
            "|---|---|---|---|",
        ]
        for wl, n, tn, e in proj:
            lines.append(f"| {wl} | {n} | ~{tn:.0f} | **~{e:.0f}%** |")
    lines += [
        "",
        "**The honest conclusion the member measurements force** (they "
        "replace r4's 45-55% N=8 projection, which modeled the per-chip "
        "baseline on the degenerate 1x1x1 program and assumed a ~15 us "
        "unpack that actually measures 2 us): tile-sharding a SINGLE "
        "stream on this runtime is floor-dominated — the member's R=0 "
        "program costs ~117 us at a quarter-frame 1080p tile (vs 119 us "
        "for the WHOLE frame unsharded) because the megakernel's ~52 us "
        "size-independent cost, the ~19 us extension materialization, "
        "and the ~16 us traced-origin tax do not shrink with the tile. "
        "Single-stream tile sharding tops out near ~30% (N=2) and FALLS "
        "with N at 1080p; ~40% at N=4 for 4K. See docs/performance.md "
        "(r5 'Sharding limit') for the proof-of-limit arithmetic.",
        "",
        "**Where the >=80% BASELINE target IS met: the batch axis.** "
        "Multi-camera loads (BASELINE config 4) shard over 'b' with "
        "ZERO halo traffic and zero extra launches — each chip runs the "
        "measured unsharded program on its local frames (the batched "
        "rows above, flat in B), plus one psum-free output gather. "
        "Per-chip per-frame cost at N chips equals the single-chip "
        "batch row at local batch B/N, which is measured FLAT in B — "
        "scaling efficiency ~100% of the batched throughput row. "
        "Mega-frame TILE sharding remains the right tool only when a "
        "single frame exceeds one chip's memory or latency budget, and "
        "its efficiency ceiling is the table above; hardware validation "
        "of the wire model needs a pod.",
    ]
    return lines


def _accelerator_reachable(timeout_s: float = 240.0) -> bool:
    """True when jax backend init completes in a child process within the
    budget. On this deployment the TPU tunnel can go down for hours, during
    which ``jax.devices()`` HANGS (no error) — probing in a subprocess is
    the only way to bound that. The budget is generous: a healthy cold
    backend init through the tunnel takes seconds."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def cli_entry() -> None:
    if not _accelerator_reachable():
        # Bench must terminate and keep its one-JSON-line contract even
        # mid-outage: fall back to the host platform (honest wall clock
        # there; the metric name carries platform+kind, so a CPU fallback
        # is self-describing, never a TPU claim).
        print(
            "warning: accelerator backend unreachable (tunnel down?); "
            "falling back to CPU",
            file=sys.stderr,
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    if "--full" in sys.argv:
        full_table()
    else:
        main()


if __name__ == "__main__":
    cli_entry()
