"""Megakernel (single-launch whole pipeline, ops/pallas/megakernel.py).

Two tiers, like test_pallas_ops: always-run geometry/gate properties, and
slow-marked interpret-mode bit-exactness pins covering both sides of the
phase-2 lax.cond (the TPU subprocess test in test_pallas_ops.py covers the
production dispatch on hardware at 1080p-class geometry).
"""
from __future__ import annotations

import numpy as np
import pytest

from cudacam_tpu.ops.pallas.megakernel import _mega_geometry, _pick_bh, mega_ok


class TestMegaGeometry:
    @pytest.mark.parametrize(
        "h,w", [(64, 256), (480, 640), (720, 1280), (1080, 1920), (2160, 3840)]
    )
    def test_production_shapes_qualify(self, h, w):
        geo = _mega_geometry(h, w)
        assert geo is not None
        bh, n_blocks, hwp, wp = geo
        assert bh % 32 == 0  # whole packed words per slab
        assert n_blocks * bh >= h
        assert hwp == n_blocks * (bh // 32) + 1  # +1 guard word-row
        from cudacam_tpu.ops.pallas.hysteresis_fused import _GUARD_LANES
        from cudacam_tpu.ops.pallas.megakernel import _MEGA_PLANE_BUDGET

        assert wp == w + _GUARD_LANES
        assert hwp * wp * 4 <= _MEGA_PLANE_BUDGET

    def test_off_granule_and_oversize_rejected(self):
        assert not mega_ok(1079, 1920)  # h % 8
        assert not mega_ok(1080, 1921)  # w % 128
        # 8K DOES qualify (r4): the megakernel holds no scan code, so its
        # plane budget is set by phase-1 VMEM only — that is what gives 8K
        # a fused hysteresis phase 1 (phase 2 = XLA continuation).
        assert mega_ok(4320, 7680)
        assert not mega_ok(8640, 15360)  # 16K planes past even that

    def test_pick_bh_minimises_dma_rows(self):
        # At 1080p the chooser must beat v1's forced 256-row slabs: 5 slabs
        # of 224 rows DMA 1200 rows total vs 5x272 = 1360.
        assert _pick_bh(1080, 1920) == 224

    @pytest.mark.parametrize("h", [32, 40, 64, 720, 1080, 2160])
    def test_pick_bh_always_valid(self, h):
        bh = _pick_bh(h, 1920)
        assert bh % 32 == 0 and 32 <= bh <= 256


@pytest.mark.slow
class TestMegaExactness:
    """Interpret-mode pins at a multi-block geometry (forced bh=32: the
    statically-predicated per-block packs, the partial last slab, and both
    convergence outcomes all execute)."""

    def _case(self, scan_after, cont="auto"):
        import jax.numpy as jnp

        from cudacam_tpu import CannyConfig
        from cudacam_tpu.io.sources import make_scene
        from cudacam_tpu.ops import xla_ops
        from cudacam_tpu.ops.pallas.megakernel import (
            canny_mega,
            canny_mega_pipeline,
        )
        from cudacam_tpu.stages import CannyStage

        h, w = 80, 256  # 3 blocks at bh=32; last slab partial (16 rows)
        cfg = CannyConfig(height=h, width=w, hysteresis_scan_after=scan_after)
        frame = jnp.asarray(make_scene(h, w, seed=5))
        planar = jnp.transpose(frame, (2, 0, 1))
        lo, hi = np.int32(10), np.int32(40)
        kw = dict(
            kernel_size=cfg.kernel_size, grad_coeff=cfg.grad_coeff,
            norm=cfg.norm, parity=cfg.parity,
            dilate_steps=cfg.hysteresis_inner_steps, scan_after=scan_after,
            max_iters=cfg.max_hysteresis_iters,
        )
        want = np.asarray(
            xla_ops.canny_to_stage(frame, lo, hi, cfg, CannyStage.HYSTER)
        )
        got_kernel, flags, _, _ = canny_mega(
            planar, lo, hi, interpret=True, block_h=32, **kw
        )
        got_pipe = np.asarray(
            canny_mega_pipeline(
                planar, lo, hi, interpret=True, cont=cont, **kw
            )
        )
        return want, np.asarray(got_kernel), got_pipe, np.asarray(flags)

    def test_converged_multiblock(self):
        want, got_kernel, got_pipe, flags = self._case(scan_after=12)
        assert flags[0, 1] == 0  # converged within phase 1
        np.testing.assert_array_equal(got_kernel, want)
        np.testing.assert_array_equal(got_pipe, want)

    @pytest.mark.parametrize("cont", ["xla", "pallas"])
    def test_phase2_continuation(self, cont):
        # scan_after=1 forces the still-growing exit: the kernel's own edge
        # map is UNWRITTEN, and the pipeline's cond must recover exactness
        # by resuming phase 2 on the exported packed planes — through BOTH
        # continuation forms (the size policy picks one in production; the
        # contract is identical).
        want, got_kernel, got_pipe, flags = self._case(
            scan_after=1, cont=cont
        )
        assert flags[0, 1] == 1  # phase boundary hit while still growing
        np.testing.assert_array_equal(got_pipe, want)

    def test_grayscale_multiblock(self):
        """A raw (H, W) grayscale frame (channels=1 config) through the
        channel-free ingest must match the xla backend exactly — same
        multi-block geometry as the BGR pins (partial last slab, clamp
        branches, zero fill all run)."""
        import jax.numpy as jnp

        from cudacam_tpu import CannyConfig
        from cudacam_tpu.io.sources import make_scene
        from cudacam_tpu.ops import xla_ops
        from cudacam_tpu.ops.pallas.canny import _gray_ok
        from cudacam_tpu.ops.pallas.megakernel import canny_mega
        from cudacam_tpu.stages import CannyStage

        h, w = 80, 256
        cfg = CannyConfig(height=h, width=w, channels=1)
        gray = jnp.asarray(make_scene(h, w, seed=5)[..., 0].copy())
        assert _gray_ok(gray)
        lo, hi = np.int32(10), np.int32(40)
        want = np.asarray(
            xla_ops.canny_to_stage(gray, lo, hi, cfg, CannyStage.HYSTER)
        )
        got, flags, _, _ = canny_mega(
            gray, lo, hi, interpret=True, block_h=32,
            kernel_size=cfg.kernel_size, grad_coeff=cfg.grad_coeff,
            norm=cfg.norm, parity=cfg.parity,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
            max_iters=cfg.max_hysteresis_iters,
        )
        assert np.asarray(flags)[0, 1] == 0
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_cap_truncation_emits_edge_map(self):
        # max_iters <= scan_after makes the cap phase 1 itself: a frame
        # still growing AT the cap must emit the truncated map (identical
        # to every other backend's), not leave the output unwritten — the
        # uninitialized-HBM hole a review caught: the kernel's unpack was
        # predicated on convergence alone while the pipeline's early
        # return assumed the map was always valid.
        import jax.numpy as jnp

        from cudacam_tpu import CannyConfig
        from cudacam_tpu.io.sources import make_scene
        from cudacam_tpu.ops import xla_ops
        from cudacam_tpu.ops.pallas.megakernel import canny_mega_pipeline
        from cudacam_tpu.stages import CannyStage

        h, w = 80, 256
        cfg = CannyConfig(
            height=h, width=w, max_hysteresis_iters=2,
            hysteresis_inner_steps=4,
        )
        frame = jnp.asarray(make_scene(h, w, seed=5))
        planar = jnp.transpose(frame, (2, 0, 1))
        lo, hi = np.int32(10), np.int32(40)
        want = np.asarray(
            xla_ops.canny_to_stage(frame, lo, hi, cfg, CannyStage.HYSTER)
        )
        got = np.asarray(
            canny_mega_pipeline(
                planar, lo, hi, kernel_size=cfg.kernel_size,
                grad_coeff=cfg.grad_coeff, norm=cfg.norm, parity=cfg.parity,
                dilate_steps=4, scan_after=cfg.hysteresis_scan_after,
                max_iters=2, interpret=True,
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_cont_value_validated(self):
        import jax.numpy as jnp

        from cudacam_tpu.ops.pallas.megakernel import canny_mega_pipeline

        with pytest.raises(ValueError, match="cont"):
            canny_mega_pipeline(
                jnp.zeros((3, 32, 128), jnp.uint8), np.int32(10),
                np.int32(40), cont="Pallas", interpret=True,
            )

    def test_dispatch_routes_through_mega(self):
        """canny_to_stage_pallas at a granule-eligible shape must produce
        the xla backend's exact output through the mega path (the dispatch
        contract ops/pallas/canny.py now carries)."""
        import jax.numpy as jnp

        from cudacam_tpu import CannyConfig
        from cudacam_tpu.io.sources import make_scene
        from cudacam_tpu.ops import xla_ops
        from cudacam_tpu.ops.pallas.canny import canny_to_stage_pallas
        from cudacam_tpu.stages import CannyStage

        h, w = 64, 256
        cfg = CannyConfig(height=h, width=w)
        assert mega_ok(h, w)
        frame = jnp.asarray(make_scene(h, w, seed=3))
        lo, hi = np.int32(10), np.int32(40)
        want = np.asarray(
            xla_ops.canny_to_stage(frame, lo, hi, cfg, CannyStage.HYSTER)
        )
        got = np.asarray(
            canny_to_stage_pallas(
                frame, lo, hi, cfg, CannyStage.HYSTER, interpret=True
            )
        )
        np.testing.assert_array_equal(got, want)


class TestContinuationConfig:
    """The CannyConfig.continuation escape hatch (VERDICT r4 #7): a
    deployment expecting cap-class inputs can statically opt the 1080p
    path into the Pallas continuation (paying the ~12 us untaken-branch
    tax for a ~3x cheaper TAKEN phase 2); outputs stay bit-identical."""

    def test_config_validates(self):
        from cudacam_tpu import CannyConfig

        with pytest.raises(ValueError, match="continuation"):
            CannyConfig(height=32, width=128, continuation="Pallas")
        for v in ("auto", "pallas", "xla"):
            assert CannyConfig(
                height=32, width=128, continuation=v
            ).continuation == v

    @pytest.mark.parametrize("continuation", ["auto", "pallas", "xla"])
    def test_flag_flows_to_pipeline(self, continuation):
        """scan_after=1 forces phase 2 on every form; all three config
        values must yield the exact XLA-backend output through the
        production dispatch (canny_to_stage_pallas)."""
        import jax.numpy as jnp

        from cudacam_tpu import CannyConfig
        from cudacam_tpu.io.sources import make_scene
        from cudacam_tpu.ops import xla_ops
        from cudacam_tpu.ops.pallas.canny import canny_to_stage_pallas
        from cudacam_tpu.stages import CannyStage

        h, w = 64, 256
        cfg = CannyConfig(
            height=h, width=w, hysteresis_scan_after=1,
            continuation=continuation,
        )
        frame = jnp.asarray(make_scene(h, w, seed=7))
        lo, hi = np.int32(10), np.int32(40)
        want = np.asarray(
            xla_ops.canny_to_stage(frame, lo, hi, cfg, CannyStage.HYSTER)
        )
        got = np.asarray(
            canny_to_stage_pallas(
                frame, lo, hi, cfg, CannyStage.HYSTER, interpret=True
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_forced_pallas_impossible_shape_warns(self):
        """continuation='pallas' at a plane size whose scan kernel cannot
        compile must warn and fall back, not hang a Mosaic compile."""
        from cudacam_tpu.ops.pallas import hysteresis_fused as hfz
        from cudacam_tpu.ops.pallas import megakernel as mk

        # Find a mega-eligible shape past the fused-kernel plane budget
        # (the 8K class): mega geometry exists, saturate/scan budget not.
        h, w = 4320, 7680
        geo = mk._mega_geometry(h, w)
        assert geo is not None
        _, _, hwp, wp = geo
        assert hwp * wp * 4 > hfz._PLANE_BUDGET
        # Exercise only the policy branch (no kernel build: interpret-mode
        # 8K through the real kernel would be minutes on CPU) by checking
        # the resolver inline — the branch lives in canny_mega_pipeline
        # before any continuation is traced, so unit-test the predicate.
        assert mk._CONT_PALLAS_MIN_PX <= h * w


class TestSplitContinuation:
    """cont='split' (r5, the 8K-class escalation form): the column-split
    phase-2 continuation must recover the exact converged output through
    the pipeline cond, and 'auto' must route past-budget plane shapes to
    it (monkeypatched budget — real 8K is not interpret-tractable)."""

    def test_split_cont_matches(self):
        import jax.numpy as jnp

        from cudacam_tpu import CannyConfig
        from cudacam_tpu.io.sources import make_scene
        from cudacam_tpu.ops import xla_ops
        from cudacam_tpu.ops.pallas.megakernel import canny_mega_pipeline
        from cudacam_tpu.stages import CannyStage

        h, w = 80, 256
        cfg = CannyConfig(height=h, width=w, hysteresis_scan_after=1)
        frame = jnp.asarray(make_scene(h, w, seed=5))
        lo, hi = np.int32(10), np.int32(40)
        want = np.asarray(
            xla_ops.canny_to_stage(frame, lo, hi, cfg, CannyStage.HYSTER)
        )
        got = np.asarray(canny_mega_pipeline(
            jnp.transpose(frame, (2, 0, 1)), lo, hi,
            dilate_steps=cfg.hysteresis_inner_steps, scan_after=1,
            max_iters=cfg.max_hysteresis_iters, cont="split",
            interpret=True,
        ))
        np.testing.assert_array_equal(got, want)

    def test_auto_routes_past_budget_to_split(self):
        """The static policy (megakernel._resolve_cont), unit-tested
        without tracing: compiling the auto-routed program under a
        monkeypatched budget segfaulted jax's persistent-cache READ
        under full-suite ordering (deployment jax 0.9 quirk), and the
        cond exactness of the split form is already pinned above — so
        the routing decision is asserted directly."""
        import warnings

        from cudacam_tpu.ops.pallas import hysteresis_fused as hfz
        from cudacam_tpu.ops.pallas import megakernel as mk

        # 8K: planes past the fused budget -> split; 4K: pallas; small:
        # xla. Shapes from the real geometry helper.
        for (h, w), want in (
            ((4320, 7680), "split"),
            ((2160, 3840), "pallas"),
            ((80, 256), "xla"),
        ):
            _, _, hwp, wp = mk._mega_geometry(h, w)
            assert mk._resolve_cont("auto", h, w, hwp, wp) == want, (h, w)
        # Forced pallas at the 8K class warns and falls back to split.
        _, _, hwp, wp = mk._mega_geometry(4320, 7680)
        assert hwp * wp * 4 > hfz._PLANE_BUDGET
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            got = mk._resolve_cont("pallas", 4320, 7680, hwp, wp)
        assert got == "split"
        assert any("unavailable" in str(r.message) for r in rec)
        # Explicit forms pass through where compilable.
        _, _, hwp, wp = mk._mega_geometry(80, 256)
        for c in ("pallas", "xla", "split"):
            assert mk._resolve_cont(c, 80, 256, hwp, wp) == c


@pytest.mark.slow
class TestBatchedMegakernel:
    """canny_mega_batched / canny_mega_pipeline_batched (r5): the whole
    batch in ONE resident launch — per-frame outputs must be bit-exact
    vs the single-frame pipeline/oracle, including when only SOME frames
    escalate to phase 2 (the per-frame continuation cond)."""

    def _frames(self, n=3, h=80, w=256):
        import jax.numpy as jnp

        from cudacam_tpu.io.sources import make_scene

        return jnp.stack(
            [jnp.asarray(make_scene(h, w, seed=10 + s)) for s in range(n)]
        )

    @pytest.mark.parametrize("scan_after", [12, 1])
    def test_matches_per_frame_oracle(self, scan_after):
        import jax.numpy as jnp

        from cudacam_tpu import CannyConfig
        from cudacam_tpu.ops import xla_ops
        from cudacam_tpu.ops.pallas.megakernel import (
            canny_mega_pipeline_batched,
        )
        from cudacam_tpu.stages import CannyStage

        h, w = 80, 256
        frames = self._frames(3, h, w)
        cfg = CannyConfig(height=h, width=w,
                          hysteresis_scan_after=scan_after)
        lo, hi = np.int32(10), np.int32(40)
        got = np.asarray(canny_mega_pipeline_batched(
            jnp.transpose(frames, (0, 3, 1, 2)), lo, hi,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=scan_after, max_iters=cfg.max_hysteresis_iters,
            interpret=True,
        ))
        for b in range(3):
            want = np.asarray(xla_ops.canny_to_stage(
                frames[b], lo, hi, cfg, CannyStage.HYSTER))
            np.testing.assert_array_equal(got[b], want, err_msg=f"b={b}")

    def test_gray_batch(self):
        import jax.numpy as jnp

        from cudacam_tpu import CannyConfig
        from cudacam_tpu.io.sources import make_scene
        from cudacam_tpu.ops import xla_ops
        from cudacam_tpu.ops.pallas.megakernel import (
            canny_mega_pipeline_batched,
        )
        from cudacam_tpu.stages import CannyStage

        h, w = 64, 256
        cfg = CannyConfig(height=h, width=w, channels=1)
        frames = jnp.stack([
            jnp.asarray(make_scene(h, w, seed=s)[..., 0].copy())
            for s in range(2)
        ])
        lo, hi = np.int32(10), np.int32(40)
        got = np.asarray(canny_mega_pipeline_batched(
            frames, lo, hi,
            dilate_steps=cfg.hysteresis_inner_steps,
            scan_after=cfg.hysteresis_scan_after,
            max_iters=cfg.max_hysteresis_iters, interpret=True,
        ))
        for b in range(2):
            want = np.asarray(xla_ops.canny_to_stage(
                frames[b], lo, hi, cfg, CannyStage.HYSTER))
            np.testing.assert_array_equal(got[b], want, err_msg=f"b={b}")

    def test_engine_batched_routes_through_batched_mega(self):
        """The engine's batched pallas path at a mega-eligible shape must
        produce per-frame bit-exact results (and still accept runtime
        threshold changes without recompiling)."""
        import jax.numpy as jnp

        from cudacam_tpu import CannyConfig
        from cudacam_tpu.engine import CannyEngine
        from cudacam_tpu.ops import numpy_oracle as oracle

        h, w = 64, 256
        cfg = CannyConfig(height=h, width=w, backend="pallas",
                          interpret=True)
        eng = CannyEngine(cfg)
        frames = np.stack([
            np.asarray(self._frames(1, h, w)[0]),
            np.asarray(self._frames(1, h, w)[0])[::-1].copy(),
        ])
        out = np.asarray(eng.process(frames))
        for b in range(2):
            want = oracle.canny_pipeline(frames[b], 10, 40)["hyster"]
            np.testing.assert_array_equal(out[b], want, err_msg=f"b={b}")
        # runtime threshold change: no recompile
        from cudacam_tpu.stages import CannyStage

        fn = eng._get_to_stage(CannyStage.HYSTER, True)
        n0 = fn._cache_size()
        eng.set_low_threshold(20)
        eng.set_high_threshold(60)
        out2 = np.asarray(eng.process(frames))
        assert fn._cache_size() == n0
        want2 = oracle.canny_pipeline(frames[0], 20, 60)["hyster"]
        np.testing.assert_array_equal(out2[0], want2)

    def test_multiblock_batched_with_prefetch(self):
        """Forced bh=32 at 80x256 (3 blocks, partial last slab) x B=3:
        the per-block predicated packs, the GLOBAL slot cycle, and the
        cross-frame DMA prefetch all execute — per-frame bit-exact vs
        the XLA backend in both scan_after regimes (review finding: all
        other batched tests were single-block geometries)."""
        import jax.numpy as jnp

        from cudacam_tpu import CannyConfig
        from cudacam_tpu.ops import xla_ops
        from cudacam_tpu.ops.pallas.megakernel import (
            canny_mega_pipeline_batched,
        )
        from cudacam_tpu.stages import CannyStage

        h, w = 80, 256
        frames = self._frames(3, h, w)
        lo, hi = np.int32(10), np.int32(40)
        for scan_after in (12, 1):
            cfg = CannyConfig(height=h, width=w,
                              hysteresis_scan_after=scan_after)
            got = np.asarray(canny_mega_pipeline_batched(
                jnp.transpose(frames, (0, 3, 1, 2)), lo, hi,
                dilate_steps=cfg.hysteresis_inner_steps,
                scan_after=scan_after,
                max_iters=cfg.max_hysteresis_iters,
                block_h=32, interpret=True,
            ))
            for b in range(3):
                want = np.asarray(xla_ops.canny_to_stage(
                    frames[b], lo, hi, cfg, CannyStage.HYSTER))
                np.testing.assert_array_equal(
                    got[b], want, err_msg=f"sa={scan_after} b={b}"
                )
