"""Sharded pipeline == single-device pipeline, bit-exact, on an 8-device
virtual CPU mesh (the driver separately dry-runs the same path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cudacam_tpu import CannyConfig, CannyStage
from cudacam_tpu.ops import numpy_oracle as oracle
from cudacam_tpu.ops import xla_ops
from cudacam_tpu.parallel import build_sharded_pipeline, make_mesh
from cudacam_tpu.parallel.sharded import shard_frame

from conftest import make_bgr_frame, make_noise_frame

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _expected(frames, low=10, high=40, **kw):
    return np.stack([oracle.canny_pipeline(f, low=low, high=high, **kw)["hyster"] for f in frames])


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(99)
    return np.stack(
        [make_bgr_frame(rng, 64, 96), make_noise_frame(rng, 64, 96), 255 - make_bgr_frame(rng, 64, 96)]
    )[:2]


class TestRowSharded:
    def test_rows8(self, frames):
        cfg = CannyConfig(height=64, width=96)
        mesh = make_mesh(batch=1, rows=8, cols=1)
        run = build_sharded_pipeline(cfg, mesh)
        out = np.asarray(run(shard_frame(jnp.asarray(frames), mesh), jnp.int32(10), jnp.int32(40)))
        np.testing.assert_array_equal(out, _expected(frames))

    def test_partial_stage(self, frames):
        cfg = CannyConfig(height=64, width=96)
        mesh = make_mesh(batch=1, rows=8, cols=1)
        for stage, key in [
            (CannyStage.GAUSSIAN, "gaussian"),
            (CannyStage.NMS, "nms"),
            (CannyStage.THRESH, "thresh"),
            (CannyStage.GRADIENT, "gradient_display"),
        ]:
            run = build_sharded_pipeline(cfg, mesh, final_stage=stage)
            out = np.asarray(run(jnp.asarray(frames), jnp.int32(10), jnp.int32(40)))
            exp = np.stack([oracle.canny_pipeline(f)[key] for f in frames])
            np.testing.assert_array_equal(out, exp, err_msg=f"stage {stage}")


class TestGridSharded:
    def test_2d_tiles(self, frames):
        # 2x4 tile grid: exercises corner halos.
        cfg = CannyConfig(height=64, width=96)
        mesh = make_mesh(batch=1, rows=2, cols=4)
        run = build_sharded_pipeline(cfg, mesh)
        out = np.asarray(run(jnp.asarray(frames), jnp.int32(10), jnp.int32(40)))
        np.testing.assert_array_equal(out, _expected(frames))

    def test_batch_and_grid(self, frames):
        # b=2, y=2, x=2: all three axes active.
        cfg = CannyConfig(height=64, width=96)
        mesh = make_mesh(batch=2, rows=2, cols=2)
        run = build_sharded_pipeline(cfg, mesh)
        out = np.asarray(run(jnp.asarray(frames), jnp.int32(10), jnp.int32(40)))
        np.testing.assert_array_equal(out, _expected(frames))


class TestCrossShardHysteresis:
    def test_edge_snakes_across_shards(self):
        # One strong seed in the top shard; a candidate line snaking through
        # every shard. The psum convergence loop must propagate it globally.
        h, w = 64, 96
        frame = np.zeros((h, w), np.uint8)
        cfg = CannyConfig(height=h, width=w, channels=1)
        mesh = make_mesh(batch=1, rows=8, cols=1)

        # A vertical line whose intensity ramps from strong to weak: finals
        # only in the top rows, an unbroken candidate chain all the way down
        # (verified against the oracle: promotion spans all 64 rows).
        frame[:, 48] = np.linspace(255, 80, h).astype(np.uint8)
        run = build_sharded_pipeline(cfg, mesh)
        out = np.asarray(run(jnp.asarray(frame)[None], jnp.int32(5), jnp.int32(90)))[0]
        exp = oracle.canny_pipeline(frame, low=5, high=90)["hyster"]
        np.testing.assert_array_equal(out, exp)
        # The weak line must actually have been promoted across shards
        # (edges run along the line's flanks, cols 46 and 50).
        assert (out[60] == 255).any()

    def test_no_seed_no_promotion(self):
        h, w = 64, 96
        frame = np.zeros((h, w), np.uint8)
        frame[:, 48] = 60  # only candidates
        cfg = CannyConfig(height=h, width=w, channels=1)
        mesh = make_mesh(batch=1, rows=8, cols=1)
        run = build_sharded_pipeline(cfg, mesh)
        out = np.asarray(run(jnp.asarray(frame)[None], jnp.int32(5), jnp.int32(90)))[0]
        exp = oracle.canny_pipeline(frame, low=5, high=90)["hyster"]
        np.testing.assert_array_equal(out, exp)


class TestKernelVariants:
    @pytest.mark.parametrize("ks", [3, 7])
    def test_kernel_sizes(self, frames, ks):
        cfg = CannyConfig(height=64, width=96, kernel_size=ks)
        mesh = make_mesh(batch=1, rows=4, cols=2)
        run = build_sharded_pipeline(cfg, mesh)
        out = np.asarray(run(jnp.asarray(frames), jnp.int32(10), jnp.int32(40)))
        np.testing.assert_array_equal(out, _expected(frames, kernel_size=ks))

    def test_opencv_parity_domain(self, frames):
        cfg = CannyConfig(height=64, width=96, parity="opencv")
        mesh = make_mesh(batch=1, rows=4, cols=2)
        run = build_sharded_pipeline(cfg, mesh)
        out = np.asarray(run(jnp.asarray(frames), jnp.int32(30), jnp.int32(120)))
        np.testing.assert_array_equal(
            out, _expected(frames, low=30, high=120, parity="opencv")
        )

    def test_l1_norm(self, frames):
        cfg = CannyConfig(height=64, width=96, norm="l1")
        mesh = make_mesh(batch=1, rows=2, cols=2, devices=jax.devices()[:4])
        run = build_sharded_pipeline(cfg, mesh)
        out = np.asarray(run(jnp.asarray(frames), jnp.int32(10), jnp.int32(40)))
        np.testing.assert_array_equal(out, _expected(frames, norm="l1"))


class TestInjectableSaturate:
    """The hysteresis round loop (extend -> saturate -> trim -> psum) is one
    composition with an injectable local operator; these tests run that SAME
    composition multi-shard with different operators, so the loop logic that
    executes on a real pod (including the remove_candidates=False / halo
    trim interplay) is verified on the 8-device virtual mesh."""

    def _snake_frame(self):
        h, w = 64, 96
        frame = np.zeros((h, w), np.uint8)
        frame[:, 48] = np.linspace(255, 80, h).astype(np.uint8)
        return frame

    def _run_with(self, saturate_builder, hh=None):
        frame = self._snake_frame()
        cfg = CannyConfig(height=64, width=96, channels=1)
        mesh = make_mesh(batch=1, rows=4, cols=2)
        run = build_sharded_pipeline(
            cfg, mesh, local_saturate=saturate_builder(cfg),
            hysteresis_halo=hh,
        )
        out = np.asarray(
            run(jnp.asarray(frame)[None], jnp.int32(5), jnp.int32(90))
        )[0]
        exp = oracle.canny_pipeline(frame, low=5, high=90)["hyster"]
        np.testing.assert_array_equal(out, exp)
        assert (out[60] == 255).any()  # cross-shard promotion happened

    def test_default_packed_operator(self):
        from cudacam_tpu.parallel.sharded import default_local_saturate

        self._run_with(default_local_saturate)

    def test_weak_operator_still_converges(self):
        # A deliberately weak operator (single dilation per round): the
        # round loop itself must carry convergence via repeated exchange.
        from cudacam_tpu.ops.bitpack import hysteresis_packed

        def weak(cfg):
            return lambda t_ext: hysteresis_packed(
                t_ext, max_iters=1, remove_candidates=False,
                dilate_steps=1, scan_after=99,
            )

        self._run_with(weak)

    def test_oracle_standin_operator(self):
        # Stand-in for TPU-only saturation kernels (the Pallas sweep
        # variant, sweep_kernel_local_saturate): any op that locally
        # saturates the extended tile composes identically. This executes
        # the exact round-loop code path the sweep kernel uses on a pod.
        from cudacam_tpu.ops.bitpack import hysteresis_packed

        def full_local(cfg):
            return lambda t_ext: hysteresis_packed(
                t_ext, max_iters=cfg.max_hysteresis_iters,
                remove_candidates=False,
            )

        self._run_with(full_local, hh=8)

    @pytest.mark.slow
    def test_fused_kernel_operator_interpret(self):
        # The pallas backend's DEFAULT saturate (the fused hysteresis
        # kernel, granule-padding halo-extended tiles internally) run in
        # interpret mode on the virtual mesh: the exact operator + round
        # loop composition a real pod executes.
        from cudacam_tpu.ops.pallas.hysteresis_fused import hysteresis_fused

        def fused_interp(cfg):
            return lambda t_ext: hysteresis_fused(
                t_ext, max_iters=cfg.max_hysteresis_iters,
                remove_candidates=False,
                dilate_steps=cfg.hysteresis_inner_steps,
                scan_after=cfg.hysteresis_scan_after, interpret=True,
            )

        self._run_with(fused_interp, hh=8)

    def test_small_halo(self):
        from cudacam_tpu.parallel.sharded import default_local_saturate

        self._run_with(default_local_saturate, hh=1)
