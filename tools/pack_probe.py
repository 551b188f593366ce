"""One-off probe: is the fused pack_pair slower than two pack_mask calls
at 1080p (where its 2x uint32 expansion, 16.6 MB, just exceeds the
on-chip budget its chunk decision only counts once)? Run ON TPU.
NOTE: archived r2 probe of the pre-r3 ROW-packed layout
(bitpack now packs 32 image rows per word; its recorded regime
conclusions carried over; the variant bodies were updated to the new
layout).
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.ops.bitpack import pack_mask, pack_pair
from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage
from cudacam_tpu.stages import CANDIDATE_EDGE, FINAL_EDGE
from tools.devtime import device_time_us

lo, hi = np.int32(10), np.int32(40)


def named(name, f):
    f.__name__ = name
    return jax.jit(f)


results = {}
for key, h, w, tag in (("1080p", 1080, 1920, "fhd"), ("8k", 4320, 7680, "ek")):
    frame = jax.device_put(make_scene(h, w, seed=0))
    thresh = jax.block_until_ready(
        jax.jit(lambda f: feed_forward_to_stage(xla_ops.rgb2mono(f), lo, hi))(
            frame
        )
    )
    pair_fn = named(f"p_pair_{tag}", lambda t: pack_pair(t))
    sep_fn = named(f"p_sep_{tag}", lambda t: (
        pack_mask(t == FINAL_EDGE),
        pack_mask(t == CANDIDATE_EDGE),
    ))
    jax.block_until_ready(pair_fn(thresh))
    jax.block_until_ready(sep_fn(thresh))
    out = {}
    for name, fn in (("pair", pair_fn), ("sep", sep_fn)):
        times = device_time_us(fn, thresh, passes=8)
        out[name] = {k: round(v, 1) for k, v in times.items()}
        print(tag, name, out[name], flush=True)
    results[key] = out
print(json.dumps(results))
