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
    # varies with content.
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
             if mixed else
             "identical frames: measures batching itself — frames run "
             "back-to-back via lax.map in one executable (~17 us/frame "
             "of map overhead vs the single-frame row; unrolled call "
             "sites measured WORSE, see engine._map_batch), flat in B"))

    # Threshold sweep (BASELINE.json config 3): K (low, high) pairs in one
    # compiled program — on the pallas backend this runs the PRODUCTION
    # kernels (one feed_forward_nmsq pass + K fused-hysteresis tails).
    K = 16
    lows_s = np.linspace(5, 60, K).astype(np.int32)
    highs_s = np.linspace(20, 180, K).astype(np.int32)
    eng_sw = CannyEngine(cfg)

    def run_sweep():
        jax.block_until_ready(eng_sw.threshold_sweep(frames[0], lows_s, highs_s))
    run_sweep()
    dev, wall = _measure_ms_per_frame(run_sweep, 1, on_tpu)
    add(f"1080p threshold sweep K={K} [{eng_sw.backend}]", dev, wall,
        "production kernels; cost ~ 1 FF pass + K hysteresis tails")

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
        "the 100-round cap (r3's sa=12 row was 2.08 ms); through the "
        "streaming engine (megakernel + taken XLA phase-2 continuation) "
        "the same input costs ~1.9 ms (was ~3.1). Both are "
        "adversarial-input ceilings, not scene behavior "
        "(docs/performance.md)")

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
        except Exception as e:  # pragma: no cover - compile-service hiccup
            print(f"  sharded 1x1x1 row skipped: {e}", file=sys.stderr)
    sharded_lines = _sharded_section()

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


def _sharded_section() -> list:
    """Markdown lines for BENCH_TABLE.md's Sharded section: the virtual
    8-device mesh's collective inventory (subprocess: needs the CPU
    platform + forced host device count before jax init) plus the N-chip
    scaling model built from measured constants."""
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
        "row above vs the unsharded stream row (r3: 2.27x; r4's packed "
        "round loop + export-mode megakernel measured 126.0 vs 124.8 us "
        "= 1.01x — tools/sharded_packed_probe.py; a 1-shard mesh axis "
        "carries zero halo slots, so the degenerate mesh runs the plain "
        "megakernel geometry + one unpack kernel).",
        "",
        "**N-chip 1080p projection, rebuilt from the r4 constants** "
        "(v5e ICI ~45 GB/s/link, ~1 us collective latency class): the "
        "measured 1x1x1 SHARDED program is the per-chip baseline (not "
        "the unsharded kernels, which forfeit nothing the sharded "
        "program doesn't also run). Its compute scales as 1/N; the "
        "per-frame costs that do NOT shrink are the unpack kernel launch "
        "(~15 us) and the round-loop glue. Wire time: the FF halo "
        "exchange moves ~0.4 MB of planar strips once (~9 us at ICI "
        "rate), and each hysteresis round exchanges ~15 KB of PACKED "
        "strips + one psum (<2 us/round; scene-typical 5 rounds). At "
        "N=8 that is ~20 us of non-scaling time against ~17 us of "
        "scaled compute — **projected scaling efficiency ~45-55% at N=8 "
        "for a SINGLE 1080p stream** (launch floors dominate at 2 ms/s "
        "of work), and **>=85% for the workloads sharding exists for**: "
        "4K/8K mega-frames (compute grows 4-16x, halo bytes only with "
        "the perimeter) and batched multi-camera loads (the batch axis "
        "shards with zero halo traffic). The BASELINE >=80% target is "
        "met by this model on its intended workloads; hardware "
        "validation needs a pod.",
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
