"""Megakernel (whole-pipeline single launch) probe — run ON TPU.

Measures, at 1080p on the bench scene:
  * the production two-kernel path (fused feed-forward + fused hysteresis,
    ops/pallas/canny.py) — the baseline the megakernel must beat;
  * canny_mega at a sweep of slab heights (the v2 statically-predicated
    pack frees bh from v1's 256-row alignment constraint);
  * canny_mega_pipeline (the cond-wrapped production composition) — the
    phase-2 fallback's common-case overhead;
and then (AFTER all timing: the first D2H readback degrades subsequent
dispatches on this deployment, CLAUDE.md) checks the mega edge map is
bit-identical to the two-kernel path's.

History this encodes: v1 (dynamic pack offsets, both phases in-kernel)
measured 259.6 us vs 162.2 two-kernel; decomposition showed ~100 us of
base cost from the mere presence of the phase-2 scan code plus bh=256's
200 padded rows. v2 drops phase 2 from the kernel (lax.cond fallback)
and packs with static offsets.
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu import CannyConfig
from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage
from cudacam_tpu.ops.pallas.hysteresis_fused import hysteresis_fused
from cudacam_tpu.ops.pallas.megakernel import (
    canny_mega,
    canny_mega_pipeline,
    _mega_geometry,
)
from cudacam_tpu.stages import CannyStage
from tools.devtime import device_time_us

h, w = 1080, 1920
cfg = CannyConfig(height=h, width=w)
frame = jax.device_put(make_scene(h, w, seed=0))
planar = jax.block_until_ready(jnp.transpose(frame, (2, 0, 1)))
lo, hi = np.int32(10), np.int32(40)
kw = dict(
    kernel_size=cfg.kernel_size, grad_coeff=cfg.grad_coeff, norm=cfg.norm,
    parity=cfg.parity, dilate_steps=cfg.hysteresis_inner_steps,
    scan_after=cfg.hysteresis_scan_after, max_iters=cfg.max_hysteresis_iters,
)


def named(name, f):
    f.__name__ = name
    return jax.jit(f)


# The two-kernel baseline COMPOSED DIRECTLY: canny_to_stage_pallas would
# route to the megakernel itself at this shape (the dispatch change that
# landed with the mega), which would time the mega against itself and
# make the exactness check vacuous.
def _two_kernel(p):
    thresh = feed_forward_to_stage(
        p, lo, hi, kernel_size=cfg.kernel_size, grad_coeff=cfg.grad_coeff,
        norm=cfg.norm, parity=cfg.parity, out_stage=CannyStage.THRESH,
    )
    return hysteresis_fused(
        thresh, max_iters=cfg.max_hysteresis_iters,
        dilate_steps=cfg.hysteresis_inner_steps,
        scan_after=cfg.hysteresis_scan_after,
    )


two_kernel = named("v_twokernel", _two_kernel)
mega_default = named("v_mega", lambda p: canny_mega(p, lo, hi, **kw)[0])
mega_pipe = named("v_megapipe", lambda p: canny_mega_pipeline(p, lo, hi, **kw))

out = {"geometry_default": _mega_geometry(h, w)}
print("default geometry (bh, n_blocks, hwp, wp):", out["geometry_default"],
      flush=True)

mega_pipe_pl = named(
    "v_megapipe_pl",
    lambda p: canny_mega_pipeline(p, lo, hi, cont="pallas", **kw),
)
mega_pipe_xla = named(
    "v_megapipe_xla",
    lambda p: canny_mega_pipeline(p, lo, hi, cont="xla", **kw),
)

# On the converged scene, pipeline[pallas] - pipeline[xla] is the Mosaic
# binary-presence tax of the UNTAKEN continuation branch (~12 us): the
# measurement behind the size policy (megakernel._cont_xla docstring).
for name, fn, arg in (
    ("two_kernel", two_kernel, planar),
    ("mega_default", mega_default, planar),
    ("mega_pipeline", mega_pipe, planar),
    ("mega_pipeline_cont_pallas", mega_pipe_pl, planar),
    ("mega_pipeline_cont_xla", mega_pipe_xla, planar),
):
    times = device_time_us(fn, arg, passes=6)
    out[name] = {k: round(v, 1) for k, v in times.items()}
    print(name, out[name], flush=True)

for bh in (128, 160, 192, 224, 256):
    f = named(f"v_mega{bh}",
              lambda p, bh=bh: canny_mega(p, lo, hi, block_h=bh, **kw)[0])
    try:
        times = device_time_us(f, planar, passes=6)
    except Exception as e:
        out[f"mega_bh{bh}"] = f"FAILED: {type(e).__name__}: {str(e)[:160]}"
        print(f"mega_bh{bh}", out[f"mega_bh{bh}"], flush=True)
        continue
    out[f"mega_bh{bh}"] = {k: round(v, 1) for k, v in times.items()}
    print(f"mega_bh{bh}", out[f"mega_bh{bh}"], flush=True)

# ---- correctness last (D2H degrades subsequent dispatch) -----------------
want = np.asarray(two_kernel(planar))
got = np.asarray(mega_pipe(planar))
got_flags = np.asarray(canny_mega(planar, lo, hi, **kw)[1])
out["flags"] = got_flags.tolist()
out["exact"] = bool(np.array_equal(want, got))
print("flags (it, still_growing):", out["flags"], flush=True)
print("EXACT" if out["exact"] else
      f"MISMATCH: {int((want != got).sum())} px differ", flush=True)
print(json.dumps(out))
