"""Per-stage device-time breakdown via XProf (run ON TPU).

Each variant is its own named jit so the trace attributes time unambiguously.
Hysteresis is fed a precomputed threshold buffer to isolate its cost.
"""
import os
import sys
import json
import functools

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
from tools.devtime import device_time_us

import numpy as np  # noqa: E402

h, w = 1080, 1920
cfg = CannyConfig(height=h, width=w)
frame = jax.device_put(make_scene(h, w, seed=0))
# numpy scalars, NOT module-level jnp scalars (see CLAUDE.md: device-array
# closure constants can be hoisted into executable parameters).
lo, hi = np.int32(10), np.int32(40)


def named(name, f):
    f.__name__ = name
    return jax.jit(f)


mono_fn = named("v_mono", lambda f: xla_ops.rgb2mono(f))
ff_gauss = named("v_ffgauss", lambda f: feed_forward_to_stage(
    xla_ops.rgb2mono(f), lo, hi, out_stage=CannyStage.GAUSSIAN))
ff_grad = named("v_ffgrad", lambda f: feed_forward_to_stage(
    xla_ops.rgb2mono(f), lo, hi, out_stage=CannyStage.GRADIENT))
ff_nms = named("v_ffnms", lambda f: feed_forward_to_stage(
    xla_ops.rgb2mono(f), lo, hi, out_stage=CannyStage.NMS))
ff_thresh = named("v_ffthresh", lambda f: feed_forward_to_stage(
    xla_ops.rgb2mono(f), lo, hi, out_stage=CannyStage.THRESH))
hyster_only = named("v_hyster", lambda t: hysteresis_pallas(
    t, max_iters=cfg.max_hysteresis_iters))
xla_hyster_only = named("v_xlahyster", lambda t: xla_ops.hysteresis(
    t, max_iters=cfg.max_hysteresis_iters,
    inner_steps=cfg.hysteresis_inner_steps))
xla_thresh = named("v_xlathresh", lambda f: xla_ops.canny_to_stage(
    f, lo, hi, cfg, CannyStage.THRESH))

thresh_buf = jax.block_until_ready(ff_thresh(frame))

out = {}
for name, fn, arg in (
    ("mono", mono_fn, frame),
    ("ff_gauss", ff_gauss, frame),
    ("ff_grad", ff_grad, frame),
    ("ff_nms", ff_nms, frame),
    ("ff_thresh", ff_thresh, frame),
    ("pallas_hyster", hyster_only, thresh_buf),
    ("xla_thresh", xla_thresh, frame),
    ("xla_hyster", xla_hyster_only, thresh_buf),
):
    times = device_time_us(fn, arg, passes=6)
    out[name] = {k: round(v, 1) for k, v in times.items()}
    print(name, out[name], flush=True)

print(json.dumps(out))
