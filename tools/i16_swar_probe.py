"""i16 SWAR feasibility probe for the fused feed-forward kernel (run ON
TPU).

The Gaussian/Sobel accumulators fit int16 (max un-normalised 5x5 sum =
255*159 = 40 545 < 2^15? NO — 40 545 > 32 767, so the 5x5 Gaussian
specifically needs a split accumulator; Sobel sums (<= 4*1020) and the
3x3 Gaussian (<= 4 080) do fit). i16 would double VPU lanes per op
(16 packed sublanes vs 8 for i32), halving the stencil chain's VPU time.

Round 2 recorded a remote Mosaic compiler crash on i16 roll/mul chains
and shipped the kernel as int32 (docs/performance.md "Tuning knobs").
This probe is the committed repro: each stage prints COMPILED/CRASHED so
a toolchain upgrade that fixes i16 is noticed immediately.

  P1: i16 elementwise mul/add chain        (no rolls)
  P2: i16 sublane roll + add               (the Gaussian's row sums)
  P3: i16 lane roll + mul + add            (the crash signature from r2)
  P4: u8 load -> i16 convert -> stencil -> i32 upcast (the real shape of
      a mixed-precision Gaussian)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 512


def _run(tag, kern, x, out_dtype=jnp.int32):
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((H, W), out_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        np.asarray(out[:1, :8])  # force execution
        print(f"{tag}: COMPILED")
        return True
    except Exception as e:
        print(f"{tag}: CRASHED {type(e).__name__}: {str(e)[:200]}")
        return False


def main():
    rng = np.random.default_rng(0)
    xi16 = jnp.asarray(rng.integers(0, 255, (H, W), np.int16))
    xu8 = jnp.asarray(rng.integers(0, 255, (H, W), np.uint8))

    def p1(x_ref, o_ref):
        x = x_ref[:, :]
        y = x * np.int16(3) + (x + x) * np.int16(2)
        o_ref[:, :] = y.astype(jnp.int32)

    def p2(x_ref, o_ref):
        x = x_ref[:, :]
        y = x + pltpu.roll(x, 1, 0) + pltpu.roll(x, H - 1, 0)
        o_ref[:, :] = y.astype(jnp.int32)

    def p3(x_ref, o_ref):
        x = x_ref[:, :]
        y = (
            x * np.int16(2)
            + pltpu.roll(x, 1, 1) * np.int16(3)
            + pltpu.roll(x, W - 1, 1)
        )
        o_ref[:, :] = y.astype(jnp.int32)

    def p4(x_ref, o_ref):
        x = x_ref[:, :].astype(jnp.int16)
        v = x + pltpu.roll(x, 1, 0) + pltpu.roll(x, H - 1, 0)
        h = (
            v * np.int16(2)
            + pltpu.roll(v, 1, 1)
            + pltpu.roll(v, W - 1, 1)
        )
        o_ref[:, :] = h.astype(jnp.int32)

    ok = [
        _run("P1 i16 mul/add", p1, xi16),
        _run("P2 i16 sublane roll", p2, xi16),
        _run("P3 i16 lane roll+mul", p3, xi16),
        _run("P4 u8->i16 stencil->i32", p4, xu8),
    ]
    print("ALL COMPILED" if all(ok) else "i16 STILL BROKEN")


if __name__ == "__main__":
    main()
