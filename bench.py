#!/usr/bin/env python
"""Benchmark entry point (driver contract: prints ONE JSON line).

The implementation lives in cudacam_tpu.benchmark so it ships with the
package (`python -m cudacam_tpu bench` / `cudacam-tpu bench` work from an
installed copy); this shim keeps the repo-root invocation the driver uses.

    python bench.py          # canonical single-line metric
    python bench.py --full   # extended table -> BENCH_TABLE.md
"""
from cudacam_tpu.benchmark import (  # noqa: F401 (re-exported for callers)
    BASELINE_MS,
    cli_entry,
    full_table,
    main,
    make_scene,
)

if __name__ == "__main__":
    cli_entry()
