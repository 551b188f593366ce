"""The examples/ scripts must stay runnable (they are documentation)."""
from __future__ import annotations

import os
import runpy

import pytest

pytestmark = pytest.mark.slow  # subprocess examples: ~2 min total

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples")


def _run(name, capsys):
    runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")
    return capsys.readouterr().out


def test_basic_example(capsys):
    out = _run("basic.py", capsys)
    assert "edges:" in out and "sweep edge counts" in out and "batched:" in out


def test_custom_source_example(capsys):
    out = _run("custom_source.py", capsys)
    assert "processed 30 frames" in out


def test_sharded_example(capsys):
    out = _run("sharded_megaframe.py", capsys)
    assert "sharded edge maps:" in out


def test_live_controls_example(capsys):
    out = _run("live_controls.py", capsys)
    assert "thresholds -> 40/160" in out
    assert "paused: True" in out
    assert "processed" in out
