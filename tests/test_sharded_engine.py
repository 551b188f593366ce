"""Tests for ShardedCannyEngine (engine API over the mesh pipeline)."""
from __future__ import annotations

import numpy as np
import pytest

import jax

from cudacam_tpu import CannyConfig, CannyStage
from cudacam_tpu.engine import ShardedCannyEngine
from cudacam_tpu.ops import numpy_oracle as oracle
from cudacam_tpu.parallel import make_mesh

from conftest import make_bgr_frame

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(42)
    return np.stack([make_bgr_frame(rng, 64, 96) for _ in range(2)])


@pytest.fixture(scope="module")
def engine():
    return ShardedCannyEngine(
        CannyConfig(height=64, width=96),
        make_mesh(batch=1, rows=4, cols=2),
    )


class TestShardedEngine:
    def test_full_pipeline_matches_oracle(self, engine, frames):
        out = np.asarray(engine.process(frames))
        for i, f in enumerate(frames):
            np.testing.assert_array_equal(
                out[i], oracle.canny_pipeline(f)["hyster"]
            )

    def test_stage_selection(self, engine, frames):
        out = np.asarray(engine.process(frames, CannyStage.NMS))
        np.testing.assert_array_equal(
            out[0], oracle.canny_pipeline(frames[0])["nms"]
        )

    def test_threshold_clamping_and_effect(self, engine, frames):
        engine.set_low_threshold(500)  # clamped to high
        assert engine.get_low_threshold() == engine.get_high_threshold()
        engine.set_high_threshold(90)
        engine.set_low_threshold(30)
        out = np.asarray(engine.process(frames))
        np.testing.assert_array_equal(
            out[0], oracle.canny_pipeline(frames[0], low=30, high=90)["hyster"]
        )
        # restore defaults for other tests (module-scoped engine)
        engine.set_low_threshold(10)
        engine.set_high_threshold(40)

    def test_input_validation(self, engine):
        with pytest.raises(ValueError):
            engine.process(np.zeros((64, 96, 3), np.uint8))  # missing batch
        with pytest.raises(ValueError):
            engine.process(np.zeros((2, 32, 96, 3), np.uint8))  # wrong spec
        with pytest.raises(ValueError):
            engine.process(np.zeros((2, 64, 96, 3), np.float32))  # dtype

    def test_batch_axis_divisibility(self, frames):
        eng = ShardedCannyEngine(
            CannyConfig(height=64, width=96), make_mesh(batch=2, rows=2, cols=2)
        )
        with pytest.raises(ValueError):
            eng.process(frames[:1])  # B=1 not divisible by mesh batch 2
        out = np.asarray(eng.process(frames))
        np.testing.assert_array_equal(
            out[1], oracle.canny_pipeline(frames[1])["hyster"]
        )

    def test_warmup(self, engine):
        engine.warmup(batch=1)  # compiles without error
