"""8K escalation: column-split continuation vs the XLA form — run ON TPU.
VERDICT r4 task #5 second half: the monolithic 8K scan kernel never
compiles (25-min Mosaic timeout, r3/r4); this probes the
compile-TRACTABLE split form (converge_packed_split: 4K-class column
slices + seam-halo rounds) against the shipping XLA continuation on a
cap-class 8K state.

Order matters: the split kernel's compile is the experiment — run it
under an external `timeout`; if Mosaic hangs on the (136, 4096)-lane
slice, retry n_split=4 (1080p-class slices, known to compile).
Prints one JSON line.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu import CannyConfig
from cudacam_tpu.io.sources import make_spiral_thresh
from cudacam_tpu.ops import bitpack
from cudacam_tpu.ops.pallas import megakernel as mk
from cudacam_tpu.ops.pallas.hysteresis_fused import converge_packed_split
from cudacam_tpu.stages import FINAL_EDGE
from tools.devtime import device_time_us

h, w = 4320, 7680
cfg = CannyConfig(height=h, width=w)
sa = cfg.hysteresis_scan_after  # 32 (mega-frame derived default)
ds = cfg.hysteresis_inner_steps  # 16 at 8K
out = {"shape": f"{h}x{w}", "scan_after": sa, "dilate_steps": ds}

_, _, hwp, wp = mk._mega_geometry(h, w)
hw_img = -(-h // 32)
spiral = jnp.asarray(make_spiral_thresh(h, w))


@jax.jit
def prep(t):
    f, p = bitpack.pack_pair(t)
    dil, _ = bitpack._make_ops(h, w, ds)
    f = jax.lax.fori_loop(0, sa, lambda i, f: dil(f, p), f)
    fP = jnp.zeros((hwp, wp), jnp.uint32).at[:hw_img, :w].set(f)
    pP = jnp.zeros((hwp, wp), jnp.uint32).at[:hw_img, :w].set(p)
    return fP, pP


fP, pP = (jax.block_until_ready(x) for x in prep(spiral))
it0 = jax.block_until_ready(jnp.full((1,), sa, jnp.int32))

# --- shipping path: the XLA phase-2 continuation -------------------------
cx = jax.jit(lambda f, p, it: mk._cont_xla(
    f, p, it[0], h=h, w=w, dilate_steps=ds, max_iters=100))
cx.__name__ = "v_cont_xla_8k"
t0 = time.time()
jax.block_until_ready(cx(fP, pP, it0))
out["xla_compile_s"] = round(time.time() - t0, 1)
t = device_time_us(cx, fP, pP, it0, passes=3)
out["cont_xla_us"] = round(sum(t.values()), 1)
print("cont_xla:", out["cont_xla_us"], "us", flush=True)

# --- candidate: column-split saturate + unpack ---------------------------
for n_split in (2, 4):
    name = f"split{n_split}"
    try:
        sp = jax.jit(lambda f, p, ns=n_split: (
            lambda ff: jnp.where(
                bitpack.unpack_mask(ff[0][:hw_img, :w], h),
                np.uint8(FINAL_EDGE), np.uint8(0))
        )(converge_packed_split(
            f, p, h, w, ns, dilate_steps=ds, scan_after=sa,
            max_iters=100)))
        sp.__name__ = f"v_cont_{name}_8k"
        t0 = time.time()
        jax.block_until_ready(sp(fP, pP))
        out[f"{name}_compile_s"] = round(time.time() - t0, 1)
        t = device_time_us(sp, fP, pP, passes=3)
        out[f"cont_{name}_us"] = round(sum(t.values()), 1)
        print(f"cont_{name}:", out[f"cont_{name}_us"], "us", flush=True)
    except Exception as e:  # pragma: no cover
        out[f"cont_{name}_us"] = f"FAILED: {str(e)[:160]}"
        print(f"{name} FAILED: {e}", flush=True)

# --- exactness LAST (D2H) -------------------------------------------------
want = np.asarray(cx(fP, pP, it0))
for n_split in (2, 4):
    key = f"split{n_split}_exact"
    if isinstance(out.get(f"cont_split{n_split}_us"), str):
        continue
    sp = jax.jit(lambda f, p, ns=n_split: (
        lambda ff: jnp.where(
            bitpack.unpack_mask(ff[0][:hw_img, :w], h),
            np.uint8(FINAL_EDGE), np.uint8(0))
    )(converge_packed_split(
        f, p, h, w, ns, dilate_steps=ds, scan_after=sa, max_iters=100)))
    got = np.asarray(sp(fP, pP))
    # Cap-truncation may differ across executors (docs/parity.md
    # carve-out); require the monotone relation + equality when both
    # converge. Report raw pixel agreement either way.
    out[key] = {
        "equal": bool(np.array_equal(got, want)),
        "diff_px": int((got != want).sum()),
        "got_minus_want": int(((got == 255) & (want == 0)).sum()),
        "want_minus_got": int(((want == 255) & (got == 0)).sum()),
    }
    print(key, out[key], flush=True)
print(json.dumps(out))
