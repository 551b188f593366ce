"""Trace-derived device timing for ad-hoc tools — thin shim over the
package implementation (cudacam_tpu/utils/devtime.py), which owns the
trace parsing; see its docstring for why wall clocks are unusable on this
deployment. This wrapper keeps the per-executable dict API the tools use.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time
from typing import Callable, Dict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cudacam_tpu.utils.devtime import _parse_device_events  # noqa: E402


def device_time_us(
    fn: Callable, *args, passes: int = 4, settle_s: float = 2.0
) -> Dict[str, float]:
    """Per-pass device busy time (us) of each jit executable ``fn`` invokes.

    ``fn(*args)`` must already be warm (compiled + every input dispatched
    once). Returns {executable_name: us_per_pass}; empty when the trace has
    no device lane (CPU)."""
    jax.block_until_ready(fn(*args))
    with tempfile.TemporaryDirectory() as logdir:
        with jax.profiler.trace(logdir):
            for _ in range(passes):
                jax.block_until_ready(fn(*args))
            # Device work may still be draining when the host loop exits
            # (readiness is acknowledged early); let it land in the window.
            time.sleep(settle_s)
        agg = _parse_device_events(logdir)
    if not agg:
        return {}
    return {k: v / passes for k, v in agg.items()}
