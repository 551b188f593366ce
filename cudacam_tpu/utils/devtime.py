"""Trace-derived device timing — the only honest clock on tunneled TPUs.

On deployments where the TPU sits behind a network tunnel (this one), wall
clocks lie in both directions: ``block_until_ready`` acknowledges before
device execution completes (a 137-GFLOP matmul "finishes" in 8 us = an
impossible 17 PFLOP/s), and sustained loops stall on host-side pipeline
effects that are not device time. The XProf device lane, however, carries
hardware timestamps: the same matmul traces at ~180 TFLOP/s, i.e. chip
peak, exactly.

``device_time_ms_per_call`` runs a callable repeatedly under a profiler
trace and returns the device-lane busy time attributed to jit executables,
per call. Falls back to ``None`` when the trace has no device lane (CPU
runs — where wall clocks are honest anyway).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile
import time
from typing import Callable, Dict, Optional

import jax


def _parse_device_events(logdir: str) -> Optional[Dict[str, float]]:
    """Total device-lane busy us per top-level jit executable, or None if
    the trace contains no TPU device lane."""
    files = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    agg: Dict[str, float] = collections.defaultdict(float)
    saw_device = False
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
        if dev_pids:
            saw_device = True
        for e in evs:
            if (
                e.get("ph") == "X"
                and e.get("pid") in dev_pids
                and e["name"].startswith("jit_")
            ):
                agg[e["name"].split("(")[0]] += e.get("dur", 0.0)
    return dict(agg) if saw_device else None


def device_time_ms_per_call(
    fn: Callable[[], object],
    calls: int = 4,
    settle_s: float = 2.0,
) -> Optional[float]:
    """Device busy ms per invocation of ``fn`` (which must be warm: already
    compiled, every input already dispatched once). Sums every jit
    executable the call invokes. None when no device lane exists (CPU)."""
    jax.block_until_ready(fn())
    with tempfile.TemporaryDirectory() as logdir:
        with jax.profiler.trace(logdir):
            for _ in range(calls):
                jax.block_until_ready(fn())
            # Device work may still be draining when the host loop exits
            # (readiness is acknowledged early); let it land in the window.
            time.sleep(settle_s)
        agg = _parse_device_events(logdir)
    if agg is None:
        return None
    return sum(agg.values()) / calls / 1e3
