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
