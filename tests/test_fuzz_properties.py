"""Property-based fuzzing of the pipeline — the reference's fuzz harness
analog (reference fuzz_test/fuzz_tester.cpp is a libFuzzer stub touching no
project code; this actually fuzzes the pipeline's invariants).

Random shapes, contents, thresholds and configurations; asserts structural
invariants and XLA-vs-oracle bit-equality on arbitrary inputs.
"""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import jax.numpy as jnp

from cudacam_tpu import CannyConfig, CannyStage
from cudacam_tpu.ops import numpy_oracle as oracle
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.stages import CANDIDATE_EDGE, FINAL_EDGE, NO_EDGE

FAST = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@st.composite
def frames(draw, min_side=8, max_side=48):
    h = draw(st.integers(min_side, max_side))
    w = draw(st.integers(min_side, max_side))
    channels = draw(st.sampled_from([1, 3]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["noise", "flat", "blocks"]))
    shape = (h, w, 3) if channels == 3 else (h, w)
    if kind == "noise":
        f = rng.integers(0, 256, shape, dtype=np.uint8)
    elif kind == "flat":
        f = np.full(shape, rng.integers(0, 256), np.uint8)
    else:
        f = np.zeros(shape, np.uint8)
        for _ in range(4):
            y0, x0 = rng.integers(0, h), rng.integers(0, w)
            hh, ww = rng.integers(1, h), rng.integers(1, w)
            f[y0 : y0 + hh, x0 : x0 + ww] = rng.integers(0, 256)
    return f


@st.composite
def thresholds(draw):
    lo = draw(st.integers(0, 255))
    hi = draw(st.integers(lo, 255))
    return lo, hi


class TestPipelineInvariants:
    @FAST
    @given(frames(), thresholds())
    @pytest.mark.slow
    def test_xla_matches_oracle_on_arbitrary_input(self, frame, th):
        lo, hi = th
        h, w = frame.shape[:2]
        c = 3 if frame.ndim == 3 else 1
        cfg = CannyConfig(height=h, width=w, channels=c)
        ours = np.asarray(
            xla_ops.canny_to_stage(
                jnp.asarray(frame), jnp.int32(lo), jnp.int32(hi),
                cfg, CannyStage.HYSTER,
            )
        )
        ref = oracle.canny_pipeline(frame, lo, hi)["hyster"]
        np.testing.assert_array_equal(ours, ref)

    @FAST
    @given(frames(), thresholds())
    def test_stage_value_domains(self, frame, th):
        lo, hi = th
        res = oracle.canny_pipeline(frame, lo, hi)
        assert set(np.unique(res["thresh"])) <= {NO_EDGE, CANDIDATE_EDGE, FINAL_EDGE}
        assert set(np.unique(res["hyster"])) <= {NO_EDGE, FINAL_EDGE}

    @FAST
    @given(frames(), thresholds())
    def test_hysteresis_bounds(self, frame, th):
        """Edges after hysteresis: superset of the strong seeds, subset of
        seeds+candidates (promotion can only add candidates)."""
        lo, hi = th
        res = oracle.canny_pipeline(frame, lo, hi)
        strong = res["thresh"] == FINAL_EDGE
        allowed = strong | (res["thresh"] == CANDIDATE_EDGE)
        final = res["hyster"] == FINAL_EDGE
        assert (strong <= final).all()
        assert (final <= allowed).all()

    @FAST
    @given(frames())
    def test_threshold_monotonicity(self, frame):
        """Raising thresholds never adds edges."""
        loose = oracle.canny_pipeline(frame, 5, 20)["hyster"] == FINAL_EDGE
        tight = oracle.canny_pipeline(frame, 40, 120)["hyster"] == FINAL_EDGE
        # Tight seeds are a subset of loose seeds AND tight candidates a
        # subset of loose candidates, so the reconstruction is monotone.
        assert (tight <= loose).all()

    @FAST
    @given(frames(min_side=8, max_side=32))
    def test_flat_frames_have_no_interior_edges(self, frame):
        """A constant frame only produces edges at the zero-padded border
        (the reference's tile fill makes the border a gradient)."""
        flat = np.full_like(frame, frame.flat[0])
        out = oracle.canny_pipeline(flat, 10, 40)["hyster"]
        assert (out[3:-3, 3:-3] == NO_EDGE).all()


class TestPackedStripProperties:
    """Hypothesis coverage of the sharded bit-strip helpers
    (parallel/packed_halo.py) at ARBITRARY offsets — the fixed-offset
    units in test_sharded.py pin known cases; these assert the algebraic
    contracts everywhere."""

    @FAST
    @given(
        st.integers(0, 2**31 - 1),
        st.integers(-31, 150),
        st.integers(2, 5),
    )
    def test_extract_place_roundtrip(self, seed, b, rows):
        from cudacam_tpu.parallel.packed_halo import _extract32, _or_place32

        rng = np.random.default_rng(seed)
        lanes = int(rng.integers(1, 9))
        cap = rows * 32
        strip = jnp.asarray(
            rng.integers(0, 2**32, size=(1, lanes), dtype=np.uint64).astype(
                np.uint32
            )
        )
        x = jnp.zeros((rows, lanes), jnp.uint32)
        placed, new = _or_place32(x, strip, b, cap)
        if b >= cap:
            # Fully past the plane: placement is a no-op (extraction at
            # such offsets is outside the helpers' contract — production
            # offsets always start inside the plane).
            np.testing.assert_array_equal(np.asarray(placed), np.asarray(x))
            assert not bool(new)
            return
        back = np.asarray(_extract32(placed, max(b, 0)))[0]
        want = np.asarray(strip)[0]
        shift = max(b, 0) - b  # rows before the plane drop
        if shift:
            want = want >> np.uint32(min(31, shift)) if shift < 32 else want * 0
        lost = max(0, b + 32 - cap)  # rows past the cap drop
        if lost >= 32:
            want = want * 0
        elif lost:
            want = want & np.uint32((1 << (32 - lost)) - 1)
        np.testing.assert_array_equal(back, want)
        assert bool(new) == bool(want.any())
        # Idempotence: placing the same strip again adds nothing.
        placed2, new2 = _or_place32(placed, strip, b, cap)
        np.testing.assert_array_equal(np.asarray(placed2), np.asarray(placed))
        assert not bool(new2)

    @FAST
    @given(st.integers(0, 2**31 - 1), st.integers(-31, 150))
    def test_place_is_monotone(self, seed, b):
        from cudacam_tpu.parallel.packed_halo import _or_place32

        rng = np.random.default_rng(seed)
        lanes = int(rng.integers(1, 9))
        base = jnp.asarray(
            rng.integers(0, 2**32, size=(4, lanes), dtype=np.uint64).astype(
                np.uint32
            )
        )
        strip = jnp.asarray(
            rng.integers(0, 2**32, size=(1, lanes), dtype=np.uint64).astype(
                np.uint32
            )
        )
        placed, _ = _or_place32(base, strip, b, 128)
        # OR placement only ADDS bits (the monotone-safety contract).
        assert bool(jnp.all((np.asarray(base) & np.asarray(placed)) == np.asarray(base)))
