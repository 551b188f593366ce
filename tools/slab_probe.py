"""Feed-forward slab-height probe INSIDE the fused full-pipeline program
(mono -> ff kernel -> packed hysteresis), where scoped-VMEM accounting is
~10% bigger than standalone (CLAUDE.md). Run ON TPU:

    python tools/slab_probe.py 8k   # bh sweep at 8K (DMA padding overhead)
    python tools/slab_probe.py fhd  # bh sweep at 1080p

Engine-exact hysteresis params (scan_after=12) — the function defaults
differ and a mismatch once confounded a sweep (extra 4x-cost scan rounds).
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.ops.bitpack import hysteresis_packed
from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage
from tools.devtime import device_time_us

lo, hi = np.int32(10), np.int32(40)

SIZES = {
    "fhd": (1080, 1920, 16, (72, 120, 216)),
    "4k": (2160, 3840, 32, (40, 72, 120)),
    "8k": (4320, 7680, 32, (32, 40, 48, 56)),
}


def main(tag: str) -> None:
    h, w, ds, bhs = SIZES[tag]
    frame = jax.device_put(make_scene(h, w, seed=0))

    def full(f, bh):
        t = feed_forward_to_stage(
            xla_ops.rgb2mono(f), lo, hi, block_h=bh
        )
        return hysteresis_packed(
            t, max_iters=100, dilate_steps=ds, scan_after=12
        )

    for bh in (None,) + bhs:
        fn = jax.jit(lambda f, bh=bh: full(f, bh))
        fn.__name__ = f"v_slab_{tag}_bh{bh}"
        try:
            jax.block_until_ready(fn(frame))
            t = device_time_us(fn, frame, passes=6)
            print(f"{tag} bh={bh}: {list(t.values())[0]:.1f} us", flush=True)
        except Exception as e:
            print(f"{tag} bh={bh}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fhd")
