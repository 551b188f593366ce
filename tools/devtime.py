"""Trace-derived device timing: the only honest clock on this deployment.

Wall-clock is unusable here: the tunnel's ``block_until_ready`` acknowledges
before device execution completes (a 137-GFLOP matmul "finishes" in 8 us =
17 PFLOP/s), and sustained loops stall on host-side pipeline effects instead
of device work. The XProf device lane, however, carries hardware timestamps:
the same matmul traces at 180 TFLOP/s =~ v5e bf16 peak, i.e. exact.

``device_time_us(fn, *args)`` runs ``fn`` ``passes`` times under a profiler
trace and returns total device-lane busy microseconds attributed to each
top-level jit executable, divided by ``passes``.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile
import time
from typing import Callable, Dict

import jax


def _parse_device_events(logdir: str) -> Dict[str, float]:
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    agg: Dict[str, float] = collections.defaultdict(float)
    for fn in files:
        with gzip.open(fn) as f:
            tr = json.load(f)
        evs = tr.get("traceEvents", [])
        dev_pids = {
            e["pid"]
            for e in evs
            if e.get("ph") == "M"
            and e.get("name") == "process_name"
            and "TPU" in e.get("args", {}).get("name", "")
        }
        for e in evs:
            if (
                e.get("ph") == "X"
                and e.get("pid") in dev_pids
                and e["name"].startswith("jit_")
            ):
                agg[e["name"].split("(")[0]] += e.get("dur", 0.0)
    return dict(agg)


def device_time_us(
    fn: Callable, *args, passes: int = 4, settle_s: float = 2.0
) -> Dict[str, float]:
    """Per-pass device busy time (us) of each jit executable ``fn`` invokes.

    ``fn(*args)`` must already be warm (compiled + every input dispatched
    once). Returns {executable_name: us_per_pass}.
    """
    jax.block_until_ready(fn(*args))
    with tempfile.TemporaryDirectory() as logdir:
        with jax.profiler.trace(logdir):
            for _ in range(passes):
                jax.block_until_ready(fn(*args))
            # Device work may still be draining when the host loop exits
            # (readiness is acknowledged early); give it time to land inside
            # the trace window.
            time.sleep(settle_s)
        agg = _parse_device_events(logdir)
    return {k: v / passes for k, v in agg.items()}
