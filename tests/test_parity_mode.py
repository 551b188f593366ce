"""Tests for the 'opencv' parity mode (threshold domain = cv2.Canny's raw
Sobel magnitudes) and the parity measurement tool."""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from cudacam_tpu import CannyConfig, CannyStage
from cudacam_tpu.io.sources import make_scene
from cudacam_tpu.ops import numpy_oracle as oracle
from cudacam_tpu.ops import xla_ops


class TestOpencvParityOracle:
    def test_sqrt_threshold_equivalence(self, rng):
        """m > t^2 must equal sqrt(m) > t on the full magnitude range."""
        m = np.arange(0, 2 * 1020 * 1020 + 1, 9973, dtype=np.int64)
        for t in (0, 1, 10, 40, 100, 255, 1000, 1443):
            np.testing.assert_array_equal(m > t * t, np.sqrt(m) > t)

    @pytest.mark.slow
    def test_oracle_vs_xla_bit_exact(self):
        frame = make_scene(48, 64, seed=11)
        for norm in ("l2", "l1"):
            cfg = CannyConfig(height=48, width=64, parity="opencv", norm=norm)
            ref = oracle.canny_pipeline(frame, 30, 120, parity="opencv", norm=norm)
            for stage, key in [(CannyStage.NMS, "nms"),
                               (CannyStage.THRESH, "thresh"),
                               (CannyStage.HYSTER, "hyster")]:
                out = np.asarray(
                    xla_ops.canny_to_stage(
                        jnp.asarray(frame), jnp.int32(30), jnp.int32(120),
                        cfg, stage,
                    )
                )
                np.testing.assert_array_equal(out, ref[key], err_msg=f"{norm}/{key}")

    def test_domains_differ_but_map_to_each_other(self):
        """Reference thresholds (t) and opencv thresholds (t * 8/grad_coeff)
        select nearly the same edges — they differ only where the reference's
        uint8 truncation loses sub-integer precision."""
        frame = make_scene(64, 96, seed=12)
        ref_mode = oracle.canny_pipeline(frame, 10, 40, parity="reference")["hyster"]
        cv_mode = oracle.canny_pipeline(frame, 20, 80, parity="opencv")["hyster"]
        # Same scale: 10*8/4=20, 40*8/4=80. Truncation boundary pixels only.
        disagree = (ref_mode != cv_mode).mean()
        assert disagree < 0.02, disagree

    def test_threshold_cap_per_parity(self):
        assert CannyConfig(height=8, width=8).threshold_cap == 255
        assert CannyConfig(height=8, width=8, parity="opencv").threshold_cap == 2048
        cfg = CannyConfig(height=8, width=8, parity="opencv")
        c2 = cfg.with_thresholds(500, 1500)
        assert (c2.low_threshold, c2.high_threshold) == (500, 1500)

    def test_engine_clamp_uses_parity_cap(self):
        from cudacam_tpu.engine import CannyEngine

        eng = CannyEngine(CannyConfig(height=16, width=16, parity="opencv",
                                      low_threshold=100, high_threshold=400))
        eng.set_high_threshold(5000)
        assert eng.get_high_threshold() == 2048


class TestProfiledParity:
    def test_profiled_matches_unprofiled_opencv_domain(self):
        """Profiling mode must apply the configured parity domain (it once
        hardwired the reference uint8 domain, silently changing results)."""
        from cudacam_tpu.engine import CannyEngine

        frame = make_scene(48, 64, seed=21)
        cfg = CannyConfig(height=48, width=64, parity="opencv",
                          low_threshold=100, high_threshold=400)
        plain = np.asarray(CannyEngine(cfg).process(frame))
        profiled = np.asarray(CannyEngine(cfg, profiling=True).process(frame))
        np.testing.assert_array_equal(profiled, plain)
        # Thresholds beyond the uint8 cap must still produce edges here.
        assert (plain == 255).any()


class TestParityTool:
    def test_compare_frame_healthy_on_photo_like_scene(self):
        from cudacam_tpu.parity import compare_frame

        frame = make_scene(96, 128, seed=13)
        scores = compare_frame(frame, 10, 40)
        # With identical gray/blur/threshold domains, only NMS tie-breaks and
        # hysteresis connectivity differ.
        assert scores["ours_within_1px_of_cv2"] > 0.9
        assert scores["cv2_within_1px_of_ours"] > 0.9

    def test_parity_report_shape(self):
        from cudacam_tpu.parity import parity_report

        rep = parity_report(n_frames=2, height=64, width=96)
        assert rep["n_frames"] >= 2
        assert set(rep["summary"]) == {
            "ours_within_1px_of_cv2",
            "cv2_within_1px_of_ours",
            "edge_count_ratio",
            "exact_iou",
        }
