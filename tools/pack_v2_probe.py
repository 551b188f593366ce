"""Candidate pack/unpack forms that avoid the 32x uint32 bit expansion
(the dominant cost of the current forms at mega-frame sizes).

pack:   (H, W) 0/1 -> reshape (H, W/8, 8) -> dot with [1,2,...,128]
        (exact in f32/i32; values <= 255) -> u8 bytes -> bitcast 4 bytes
        to one LSB-first uint32 word. Intermediate is W/8 bytes per row
        instead of W uint32s.
unpack: bitcast words to (H, Ww, 4) u8 -> 8x byte expansion with u8
        shifts -> (H, W) u8 bits. Intermediate stays u8 (4 bytes/px
        instead of 4 u32s/px... 1x vs 4x).

Correctness is asserted vs the shipping pack_mask/unpack_mask on every
run (any platform); timings print on TPU.

NOTE: archived r2 probe of the pre-r3 ROW-packed layout
(bitpack now packs 32 image rows per word; kept for the recorded
conclusions in its docstring, not as a shipping-layout check).
"""
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")  # env alone is overridden
import jax.numpy as jnp
import numpy as np

from cudacam_tpu.ops.bitpack import pack_mask, unpack_mask


def _iota8(dtype):
    return jax.lax.broadcasted_iota(dtype, (1, 1, 1, 8), 3)


def pack_dot_f32(mask: jnp.ndarray) -> jnp.ndarray:
    h, w = mask.shape
    ww = -(-w // 32)
    m = jnp.pad(mask, ((0, 0), (0, ww * 32 - w)))
    f = m.reshape(h, ww * 4, 8).astype(jnp.float32)
    wts = jnp.asarray((2.0 ** np.arange(8)).astype(np.float32))
    by = jnp.einsum("hkb,b->hk", f, wts).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(by.reshape(h, ww, 4), jnp.uint32)


def pack_sum_i32(mask: jnp.ndarray) -> jnp.ndarray:
    h, w = mask.shape
    ww = -(-w // 32)
    m = jnp.pad(mask, ((0, 0), (0, ww * 32 - w)))
    v = m.reshape(h, ww * 4, 8).astype(jnp.int32)
    wts = jnp.asarray((1 << np.arange(8)).astype(np.int32))
    by = jnp.sum(v * wts, axis=-1, dtype=jnp.int32).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(by.reshape(h, ww, 4), jnp.uint32)


def pack_pair_dot(thresh: jnp.ndarray, final_v: int, cand_v: int):
    """Both planes from ONE read of thresh, byte-dot form, transposed
    compute layout out (the pack_pair contract)."""
    h, w = thresh.shape
    ww = -(-w // 32)
    t = jnp.pad(thresh, ((0, 0), (0, ww * 32 - w))) if w != ww * 32 else thresh
    tr = t.reshape(h, ww * 4, 8)
    wts = jnp.asarray((2.0 ** np.arange(8)).astype(np.float32))

    def plane(v):
        f = (tr == np.uint8(v)).astype(jnp.float32)
        by = jnp.einsum("hkb,b->hk", f, wts).astype(jnp.uint8)
        return jax.lax.bitcast_convert_type(
            by.reshape(h, ww, 4), jnp.uint32
        ).T

    return plane(final_v), plane(cand_v)


def unpack_bytes_u8(words: jnp.ndarray, width: int) -> jnp.ndarray:
    h, ww = words.shape
    by = jax.lax.bitcast_convert_type(words, jnp.uint8)  # (H, Ww, 4)
    bits = (by[..., None] >> _iota8(jnp.uint8)) & np.uint8(1)
    return bits.reshape(h, ww * 32)[:, :width].astype(jnp.bool_)


def main() -> None:
    rng = np.random.default_rng(0)
    for h, w in ((13, 100), (601, 7680)):
        m = rng.random((h, w)) < 0.37
        want = np.asarray(pack_mask(jnp.asarray(m)))
        for name, fn in (("dot_f32", pack_dot_f32), ("sum_i32", pack_sum_i32)):
            got = np.asarray(jax.jit(fn)(jnp.asarray(m)))
            assert (got == want).all(), (name, h, w)
        rt = np.asarray(jax.jit(unpack_bytes_u8, static_argnums=1)(
            jnp.asarray(want), w))
        assert (rt == m).all(), ("unpack_bytes_u8", h, w)
        th = np.where(m, 255, 0).astype(np.uint8)
        th[rng.random((h, w)) < 0.3] = 128
        from cudacam_tpu.ops.bitpack import pack_pair

        wf, wp = (np.asarray(a) for a in pack_pair(jnp.asarray(th)))
        gf, gp = (np.asarray(a) for a in jax.jit(
            pack_pair_dot, static_argnums=(1, 2))(jnp.asarray(th), 255, 128))
        assert (gf == wf).all() and (gp == wp).all(), ("pair_dot", h, w)
    print("exactness: all candidates match the shipping forms", flush=True)

    if jax.devices()[0].platform == "cpu":
        return
    from cudacam_tpu.io.sources import make_scene
    from cudacam_tpu.ops import xla_ops
    from cudacam_tpu.ops.pallas.feedforward import feed_forward_to_stage
    from cudacam_tpu.stages import FINAL_EDGE
    from tools.devtime import device_time_us

    lo, hi = np.int32(10), np.int32(40)
    for tag, h, w in (("fhd", 1080, 1920), ("ek", 4320, 7680)):
        frame = jax.device_put(make_scene(h, w, seed=0))
        thresh = jax.block_until_ready(
            jax.jit(
                lambda f: feed_forward_to_stage(xla_ops.rgb2mono(f), lo, hi)
            )(frame)
        )

        def named(name, f):
            f.__name__ = name
            return jax.jit(f)

        from cudacam_tpu.stages import CANDIDATE_EDGE as CANDIDATE

        # every candidate reads thresh once per plane, like the current form
        cands = [
            ("pack_now", named(f"p0_{tag}", lambda t: (
                pack_mask(t == np.uint8(FINAL_EDGE)).T,
                pack_mask(t == np.uint8(CANDIDATE)).T))),
            ("pack_dot", named(f"p1_{tag}", lambda t: (
                pack_dot_f32(t == np.uint8(FINAL_EDGE)).T,
                pack_dot_f32(t == np.uint8(CANDIDATE)).T))),
            ("pack_sum", named(f"p2_{tag}", lambda t: (
                pack_sum_i32(t == np.uint8(FINAL_EDGE)).T,
                pack_sum_i32(t == np.uint8(CANDIDATE)).T))),
            ("pair_dot", named(f"p3_{tag}", lambda t: pack_pair_dot(
                t, FINAL_EDGE, CANDIDATE))),
        ]
        f0 = None
        for name, fn in cands:
            out = jax.block_until_ready(fn(thresh))
            if f0 is None:
                f0 = out[0]
            t = device_time_us(fn, thresh, passes=6)
            print(tag, name, f"{list(t.values())[0]:.1f} us", flush=True)

        unps = [
            ("unpack_now", named(f"u0_{tag}", lambda f: jnp.where(
                unpack_mask(f.T, w), jnp.uint8(255), jnp.uint8(0)))),
            ("unpack_u8", named(f"u1_{tag}", lambda f: jnp.where(
                unpack_bytes_u8(f.T, w), jnp.uint8(255), jnp.uint8(0)))),
        ]
        for name, fn in unps:
            jax.block_until_ready(fn(f0))
            t = device_time_us(fn, f0, passes=6)
            print(tag, name, f"{list(t.values())[0]:.1f} us", flush=True)


if __name__ == "__main__":
    main()
