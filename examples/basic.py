"""Library quickstart: process frames, inspect stages, sweep thresholds.

Run:  python examples/basic.py
"""
import os
import sys

# Make the example runnable from a source checkout (no-op when the
# package is installed).
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from cudacam_tpu import CannyConfig, CannyStage
from cudacam_tpu.engine import CannyEngine
from cudacam_tpu.io.sources import make_scene

h, w = 480, 640
engine = CannyEngine(CannyConfig(height=h, width=w))
frame = make_scene(h, w, seed=1)  # any (H, W, 3) BGR uint8 array

# Full pipeline -> device-resident uint8 edge map (255 = edge).
edges = np.asarray(engine.process(frame))
print(f"edges: {edges.shape} {edges.dtype}, {int((edges == 255).sum())} edge px")

# Run-to-stage-k returns that stage's display buffer.
nms = np.asarray(engine.process(frame, CannyStage.NMS))
print(f"NMS magnitudes: max={int(nms.max())}")

# Runtime threshold changes never recompile.
engine.set_low_threshold(20)
engine.set_high_threshold(80)
edges_tight = np.asarray(engine.process(frame))
print(f"tighter thresholds: {int((edges_tight == 255).sum())} edge px")

# K (low, high) pairs in ONE compiled program.
maps, counts = engine.threshold_sweep(frame, [5, 10, 20], [40, 80, 160])
print("sweep edge counts:", list(np.asarray(counts)))

# Batched multi-camera frames are first-class.
batch = np.stack([make_scene(h, w, seed=s) for s in range(4)])
out = engine.process(batch)
print("batched:", out.shape)
