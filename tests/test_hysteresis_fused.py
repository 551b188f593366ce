"""Fused Pallas hysteresis kernel (ops/pallas/hysteresis_fused.py).

The kernel's contract is BIT-IDENTITY with the canonical XLA loop
(bitpack.hysteresis_packed) in every regime — converged, cap-truncated,
and phase-2-escalated — because both execute bitpack._make_ops' shared
round schedule. These tests enforce that contract in interpret mode (the
only Pallas execution on CPU); tests/test_pallas_ops.py's TPU subprocess
enforces it on hardware at 1080p including the adversarial spiral.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cudacam_tpu.io.sources import make_spiral_thresh
from cudacam_tpu.ops import numpy_oracle as oracle
from cudacam_tpu.ops.bitpack import hysteresis_packed
from cudacam_tpu.ops.pallas.hysteresis_fused import (
    _geometry,
    fused_ok,
    hysteresis_fused,
)

_hp = jax.jit(
    hysteresis_packed,
    static_argnames=(
        "max_iters", "dilate_steps", "scan_after", "return_iters",
    ),
)


class TestGeometry:
    def test_fused_ok_production_sizes(self):
        assert fused_ok(1080, 1920)   # 1080p
        assert fused_ok(720, 1280)    # 720p
        assert fused_ok(2160, 3840)   # 4K
        assert not fused_ok(4320, 7680)  # 8K: packed planes past budget
        # Off-granule and tiny shapes qualify via internal zero padding
        # (exact: pad cells are absorbing NO_EDGE) — what lets the sharded
        # path's halo-extended tiles use the kernel.
        assert fused_ok(1079, 1921)
        assert fused_ok(1112, 1952)   # 1080p tile + 16 px halo ring
        assert fused_ok(24, 100)

    def test_geometry_invariants(self):
        for h, w in [(32, 128), (320, 256), (1080, 1920), (2160, 3840)]:
            ch, n_chunks, hwp, wp = _geometry(h, w)
            assert ch % 32 == 0 and n_chunks * ch >= h
            # >= 1 zero guard word-row past the data, 128 guard lanes.
            assert hwp > -(-h // 32)
            assert wp == w + 128


@pytest.mark.slow
class TestFusedParity:
    """Interpret-mode bit-identity vs the canonical loop (and transitively
    the oracle, which test_bitpack pins against hysteresis_packed)."""

    def _check(self, t, **kw):
        got, gi = hysteresis_fused(
            jnp.asarray(t), return_iters=True, interpret=True, **kw
        )
        want, wi = _hp(jnp.asarray(t), return_iters=True, **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert int(gi) == int(wi), (int(gi), int(wi))
        return np.asarray(got)

    def test_random_fields(self):
        rng = np.random.default_rng(5)
        for h, w in [(32, 128), (64, 256), (320, 128)]:
            t = rng.choice(
                [0, 128, 255], size=(h, w), p=[0.5, 0.4, 0.1]
            ).astype(np.uint8)
            out = self._check(t)
            np.testing.assert_array_equal(out, oracle.hysteresis(t))

    def test_cap_truncation_and_escalation(self):
        """Every phase boundary: capped mid-phase-1, capped at phase
        entry, escalated to scans, converged, and the always-one-round
        floor (max_iters=0)."""
        t = make_spiral_thresh(64, 256)
        for kw in (
            dict(max_iters=2, dilate_steps=16, scan_after=10),
            dict(max_iters=3, dilate_steps=4, scan_after=2),
            dict(max_iters=100, dilate_steps=4, scan_after=2),
            dict(max_iters=100, dilate_steps=16, scan_after=10),
            dict(max_iters=0, dilate_steps=16, scan_after=10),
        ):
            self._check(t, **kw)

    def test_long_straight_run_scans(self):
        """A 4 kpx run exercises the masked large-shift scan steps (lane
        shifts far past the 128-lane guard ring)."""
        t = np.zeros((32, 4096), np.uint8)
        t[4, 1:4090] = 128
        t[4, 1] = 255
        out = self._check(t, dilate_steps=4, scan_after=2)
        np.testing.assert_array_equal(
            out == 255, oracle.hysteresis(t) == 255
        )

    def test_vertical_run_word_shifts(self):
        """A tall run exercises masked word-axis shifts past the single
        guard word-row (vertical scan steps of 64+ rows)."""
        t = np.zeros((512, 128), np.uint8)
        t[1:500, 4] = 128
        t[1, 4] = 255
        self._check(t, dilate_steps=4, scan_after=2)


@pytest.mark.slow
class TestSaturatePacked:
    """saturate_packed (the sharded round loop's Pallas operator) vs
    bitpack.converge_packed on the same guard-ringed planes: same two
    phases, same factory schedule, bit-identical — converged AND
    cap-truncated — plus the growing flag."""

    @pytest.mark.parametrize("max_iters", [2, 100])
    def test_matches_converge_packed(self, max_iters):
        from cudacam_tpu.ops.bitpack import converge_packed, pack_pair
        from cudacam_tpu.ops.pallas.hysteresis_fused import saturate_packed

        t = make_spiral_thresh(64, 256)
        f, p = pack_pair(jnp.asarray(t))
        # Guard-ringed layout: one zero word-row + 128 zero lanes.
        pad = ((0, 1), (0, 128))
        fg, pg = jnp.pad(f, pad), jnp.pad(p, pad)
        got, growing = saturate_packed(
            fg, pg, 64, 256, dilate_steps=4, scan_after=2,
            max_iters=max_iters, interpret=True,
        )
        want, _, want_growing = converge_packed(
            jnp.asarray(fg), jnp.asarray(pg), 64, 256,
            dilate_steps=4, scan_after=2, max_iters=max_iters,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert bool(growing) == bool(want_growing)
        assert bool(growing) == (max_iters == 2)  # spiral truncates at 2


@pytest.mark.slow
class TestBatchedSections:
    """hysteresis_fused_batched's hardest claim (ADVICE r3): stacked
    sections of DIFFERENT convergence depths share global round indices,
    so each section is bit-identical to a solo run *including under cap
    truncation* — rounds run until the slowest section converges, and a
    converged section sits at its absorbing fixed point through the extra
    rounds."""

    def _sections(self):
        rng = np.random.default_rng(11)
        fast = rng.choice(
            [0, 128, 255], size=(64, 256), p=[0.6, 0.3, 0.1]
        ).astype(np.uint8)  # converges in a couple of rounds
        slow = make_spiral_thresh(64, 256)  # single long chain
        return fast, slow

    @pytest.mark.parametrize("max_iters", [2, 5, 100])
    def test_cap_parity_with_solo_runs(self, max_iters):
        from cudacam_tpu.ops.pallas.hysteresis_fused import (
            hysteresis_fused_batched,
        )

        fast, slow = self._sections()
        kw = dict(max_iters=max_iters, dilate_steps=4, scan_after=2)
        got = np.asarray(hysteresis_fused_batched(
            jnp.stack([jnp.asarray(fast), jnp.asarray(slow)]),
            interpret=True, **kw,
        ))
        for i, t in enumerate((fast, slow)):
            solo_fused = np.asarray(
                hysteresis_fused(jnp.asarray(t), interpret=True, **kw)
            )
            solo_packed = np.asarray(_hp(jnp.asarray(t), **kw))
            np.testing.assert_array_equal(got[i], solo_fused)
            np.testing.assert_array_equal(got[i], solo_packed)


@pytest.mark.slow
class TestSweepDispatch:
    """threshold_sweep_pallas' two tail dispatches — unrolled solo
    kernels (the r4 default; measured fastest, ops/pallas/canny.py) and
    the lax.map fallback (K past the unroll guard, or frames past the
    fused kernel's budget) — must both match the XLA sweep
    bit-for-bit."""

    def _case(self):
        from cudacam_tpu.config import CannyConfig
        from cudacam_tpu.ops import xla_ops

        rng = np.random.default_rng(3)
        frame = rng.integers(0, 255, size=(64, 256, 3), dtype=np.uint8)
        cfg = CannyConfig(height=64, width=256)
        lows = np.array([5, 10, 20, 30, 40], np.int32)
        highs = np.array([40, 50, 60, 80, 90], np.int32)
        want = xla_ops.threshold_sweep(
            jnp.asarray(frame), jnp.asarray(lows), jnp.asarray(highs), cfg
        )
        return frame, cfg, lows, highs, want

    def test_unrolled_tails(self):
        from cudacam_tpu.ops.pallas import canny as pl_canny

        frame, cfg, lows, highs, (want_maps, want_counts) = self._case()
        maps, counts = pl_canny.threshold_sweep_pallas(
            jnp.asarray(frame), lows, highs, cfg, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(maps), np.asarray(want_maps))
        np.testing.assert_array_equal(
            np.asarray(counts), np.asarray(want_counts)
        )

    def test_lax_map_fallback(self, monkeypatch):
        from cudacam_tpu.ops.pallas import canny as pl_canny

        frame, cfg, lows, highs, (want_maps, want_counts) = self._case()
        monkeypatch.setattr(pl_canny, "_SWEEP_UNROLL_MAX", 2)
        maps, counts = pl_canny.threshold_sweep_pallas(
            jnp.asarray(frame), lows, highs, cfg, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(maps), np.asarray(want_maps))
        np.testing.assert_array_equal(
            np.asarray(counts), np.asarray(want_counts)
        )


@pytest.mark.slow
class TestMonotoneSeededSweep:
    """sweep_fused(monotone_seed=True): the warm-started sweep must be
    bit-identical to cold starts on CONVERGED runs — for sorted pair
    lists (full domination chain), shuffled lists (the in-kernel
    domination check must fall back to cold starts rather than seed from
    a non-dominating neighbor), and duplicate pairs (domination with
    equality)."""

    def _kg_and_bounds(self, lows, highs):
        from cudacam_tpu.config import CannyConfig
        from cudacam_tpu.ops import xla_ops
        from cudacam_tpu.ops.pallas import canny as pl_canny

        rng = np.random.default_rng(3)
        frame = rng.integers(0, 255, size=(64, 256, 3), dtype=np.uint8)
        cfg = CannyConfig(height=64, width=256)
        mono = xla_ops.rgb2mono(jnp.asarray(frame))
        blur = xla_ops.gaussian_blur(mono, 5)
        sx, sy = xla_ops.sobel_sums(blur)
        keep = xla_ops.nms_keep_mask(sx, sy, "l2")
        kg = jnp.where(keep, sx * sx + sy * sy, 0).astype(jnp.int32)
        bl, bh = [], []
        for lo, hi in zip(lows, highs):
            lo_b = xla_ops.threshold_magnitude_bound(
                jnp.int32(lo), cfg.grad_coeff, cfg.norm
            )
            hi_b = xla_ops.threshold_magnitude_bound(
                jnp.int32(hi), cfg.grad_coeff, cfg.norm
            )
            bl.append(lo_b - 1)
            bh.append(hi_b - 1)
        bounds = jnp.stack([x for pair in zip(bl, bh) for x in pair])
        return kg, bounds

    @pytest.mark.parametrize(
        "lows,highs",
        [
            ([5, 10, 20, 30, 40], [40, 50, 60, 80, 90]),  # ascending
            ([40, 5, 20, 30, 10], [90, 40, 60, 80, 50]),  # shuffled
            ([10, 10, 30, 30], [40, 40, 80, 80]),  # duplicates
            ([5, 40, 10, 30], [90, 50, 80, 40]),  # NON-dominating mix
        ],
    )
    def test_seeded_equals_cold(self, lows, highs):
        from cudacam_tpu.ops.pallas.hysteresis_fused import sweep_fused

        kg, bounds = self._kg_and_bounds(lows, highs)
        kw = dict(max_iters=100, dilate_steps=4, scan_after=2,
                  interpret=True)
        cold = np.asarray(sweep_fused(kg, bounds, **kw))
        warm = np.asarray(
            sweep_fused(kg, bounds, monotone_seed=True, **kw)
        )
        np.testing.assert_array_equal(warm, cold)


@pytest.mark.slow
class TestConvergePackedSplit:
    """converge_packed_split (r5, the 8K escalation form): column-sliced
    convergence with seam-halo rounds must reach the SAME fixed point as
    the monolithic converge — including chains that snake across the
    seam many times — per the multi-tile converged-identity contract."""

    @pytest.mark.parametrize("n_split", [2, 4])
    def test_matches_monolithic(self, n_split):
        from cudacam_tpu.ops.bitpack import converge_packed, pack_pair
        from cudacam_tpu.ops.pallas.hysteresis_fused import (
            converge_packed_split,
        )

        # The spiral crosses every column repeatedly — every seam is
        # exercised in both directions.
        t = make_spiral_thresh(64, 512)
        f, p = pack_pair(jnp.asarray(t))
        pad = ((0, 1), (0, 128))
        fg, pg = jnp.pad(f, pad), jnp.pad(p, pad)
        got, growing = converge_packed_split(
            fg, pg, 64, 512, n_split, dilate_steps=4, scan_after=2,
            max_iters=300, interpret=True,
        )
        want, _, want_growing = converge_packed(
            jnp.asarray(fg), jnp.asarray(pg), 64, 512,
            dilate_steps=4, scan_after=2, max_iters=300,
        )
        assert not bool(want_growing)
        assert not bool(growing)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_random_field(self):
        from cudacam_tpu.ops.bitpack import converge_packed, pack_pair
        from cudacam_tpu.ops.pallas.hysteresis_fused import (
            converge_packed_split,
        )

        rng = np.random.default_rng(7)
        t = rng.choice(
            [0, 128, 255], size=(96, 256), p=[0.55, 0.4, 0.05]
        ).astype(np.uint8)
        f, p = pack_pair(jnp.asarray(t))
        pad = ((0, 1), (0, 128))
        fg, pg = jnp.pad(f, pad), jnp.pad(p, pad)
        got, growing = converge_packed_split(
            fg, pg, 96, 256, 2, dilate_steps=4, scan_after=2,
            max_iters=200, interpret=True,
        )
        want, _, _ = converge_packed(
            jnp.asarray(fg), jnp.asarray(pg), 96, 256,
            dilate_steps=4, scan_after=2, max_iters=200,
        )
        assert not bool(growing)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("chunk", [4, 8])
    def test_chunked_matches_monolithic_when_converged(self, chunk):
        """Chunked budget accounting: with budget to spare, the chunked
        split must reach the same unique fixed point."""
        from cudacam_tpu.ops.bitpack import converge_packed, pack_pair
        from cudacam_tpu.ops.pallas.hysteresis_fused import (
            converge_packed_split,
        )

        t = make_spiral_thresh(64, 512)
        f, p = pack_pair(jnp.asarray(t))
        pad = ((0, 1), (0, 128))
        fg, pg = jnp.pad(f, pad), jnp.pad(p, pad)
        got, growing = converge_packed_split(
            fg, pg, 64, 512, 2, dilate_steps=4, scan_after=2,
            max_iters=3000, chunk=chunk, interpret=True,
        )
        want, _, _ = converge_packed(
            jnp.asarray(fg), jnp.asarray(pg), 64, 512,
            dilate_steps=4, scan_after=2, max_iters=3000,
        )
        assert not bool(growing)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_chunked_budget_truncates_monotone(self):
        """A tight budget must truncate to a monotone under-approximation
        (capped FINALs between seeds and the fixed point) and raise the
        growing flag."""
        from cudacam_tpu.ops.bitpack import converge_packed, pack_pair
        from cudacam_tpu.ops.pallas.hysteresis_fused import (
            converge_packed_split,
        )

        t = make_spiral_thresh(64, 512)
        f, p = pack_pair(jnp.asarray(t))
        pad = ((0, 1), (0, 128))
        fg, pg = jnp.pad(f, pad), jnp.pad(p, pad)
        capped, growing = converge_packed_split(
            fg, pg, 64, 512, 2, dilate_steps=4, scan_after=2,
            max_iters=12, chunk=4, interpret=True,
        )
        full, _, _ = converge_packed(
            jnp.asarray(fg), jnp.asarray(pg), 64, 512,
            dilate_steps=4, scan_after=2, max_iters=3000,
        )
        capped, full, seeds = (
            np.asarray(capped), np.asarray(full), np.asarray(fg))
        assert bool(growing)
        assert ((capped & ~full) == 0).all()  # capped subset of fixed point
        assert ((seeds & ~capped) == 0).all()  # seeds subset of capped
        assert capped.sum() < full.sum()
