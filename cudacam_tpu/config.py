"""Configuration for the TPU-native Canny pipeline.

The reference keeps its configuration in three tiers — compile-time CMake
options, compile-time constants (thresholds 10/40 at cannyEdgeH.cu:22-23,
Gaussian taps at cannyEdgeH.cu:372-380, grad coefficient at cannyEdgeD.cu:28),
and runtime UI state (imguiApp.cpp:303-349). This module promotes all of them
into one frozen dataclass, plus the extensions mandated by BASELINE.json:
variable kernel size (3/5/7), L1/L2 gradient norm, and sharding/mesh shape.

Static vs runtime split: fields that change compiled code (shapes, kernel
size, norm, backend, final stage) are static; thresholds are *runtime*
arguments to the jitted pipeline so slider changes never recompile
(the reference pays a kernel re-launch, we pay nothing).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Integer Gaussian taps. The 5x5 set is the canonical Canny-paper kernel used
# by the reference (cannyEdgeH.cu:372-380, sum 159). 3x3 / 7x7 are standard
# binomial kernels (powers of two, so the normalisation is a shift) added per
# BASELINE.json config 3.
GAUSSIAN_TAPS: dict[int, Tuple[Tuple[int, ...], ...]] = {
    3: (
        (1, 2, 1),
        (2, 4, 2),
        (1, 2, 1),
    ),  # sum 16
    5: (
        (2, 4, 5, 4, 2),
        (4, 9, 12, 9, 4),
        (5, 12, 15, 12, 5),
        (4, 9, 12, 9, 4),
        (2, 4, 5, 4, 2),
    ),  # sum 159
    7: (
        (1, 6, 15, 20, 15, 6, 1),
        (6, 36, 90, 120, 90, 36, 6),
        (15, 90, 225, 300, 225, 90, 15),
        (20, 120, 300, 400, 300, 120, 20),
        (15, 90, 225, 300, 225, 90, 15),
        (6, 36, 90, 120, 90, 36, 6),
        (1, 6, 15, 20, 15, 6, 1),
    ),  # sum 4096
}


def gaussian_kernel_sum(kernel_size: int) -> int:
    return sum(sum(row) for row in GAUSSIAN_TAPS[kernel_size])


@dataclasses.dataclass(frozen=True)
class CannyConfig:
    """Full pipeline configuration.

    Image specs are locked at engine construction, mirroring the reference's
    spec-locked init (cannyEdgeH.cu:124-130 rejects frames whose dimensions
    differ from the constructor's).
    """

    height: int
    width: int
    channels: int = 3  # 3 = BGR (OpenCV byte order, cannyEdgeD.cu:67), 1 = mono

    # --- algorithm parameters -------------------------------------------
    kernel_size: int = 5  # Gaussian kernel: 3, 5 or 7
    norm: str = "l2"  # 'l2' (reference, cannyEdgeD.cu:195) or 'l1' extension
    grad_coeff: int = 4  # GRAD_COEFF (cannyEdgeD.cu:28)
    low_threshold: int = 10  # default (cannyEdgeH.cu:22); runtime-adjustable
    high_threshold: int = 40  # default (cannyEdgeH.cu:23); runtime-adjustable

    # --- hysteresis ------------------------------------------------------
    # Global round cap: "safety belt", reference caps host relaunches at
    # 100 (cannyEdgeH.cu:313). Ours caps bit-packed promotion rounds
    # (ops/bitpack.py); identical across backends, so outputs stay
    # bit-identical even when the cap truncates.
    max_hysteresis_iters: int = 100
    # Bit-parallel dilations fused per round/convergence check. Default
    # (None): 16 everywhere except 32 in the 4K band. The optimum tracks
    # the SCENE's propagation depth, not the frame diameter, and the
    # waste of overshooting convergence grows with both the step count
    # and the state size (r4 megakernel sweep,
    # tools/megaframe_ds_probe.py: 4K 740/750/770 us at ds 32/48/64; 8K
    # 1989/2101/2163 at 16/32/48). The knob is exposed for
    # depth-atypical content.
    hysteresis_inner_steps: Optional[int] = None
    # Rounds of pure dilation before escalating to the 8-direction
    # carry-lookahead scans (long straight candidate runs). Default
    # (None): 64 at <=1080p, 32 on mega-frames. Escalation is expensive
    # relative to the rounds it skips — a 1080p phase-1 round costs
    # ~5.2 us in-kernel while a TAKEN phase-2 continuation costs
    # 0.6-3.5 ms (tools/escalation_probe.py) — and real scenes converge
    # in phase 1 when allowed: the slowest measured scene is 31 rounds
    # (ks=3 seed 0) at 1080p, 15 at 4K. r3's scan_after=12 made that one
    # scene wear the continuation every frame (the ks=3 row's 2x
    # regression, VERDICT r3); the derived defaults sit ~2x past the
    # slowest measured scene. Raising it also LOWERS the adversarial
    # ceiling: at the 100-round cap, later escalation truncates the
    # expensive scan rounds, not the cheap dilations (1080p spiral:
    # 2.08 -> 1.02 ms direct at sa=72). The escalation valve itself stays
    # (scan_after < max_iters) for inputs with genuinely long monotone
    # runs.
    hysteresis_scan_after: Optional[int] = None

    # --- execution -------------------------------------------------------
    backend: str = "auto"  # 'pallas' | 'xla' | 'auto'
    parity: str = "reference"  # 'reference' | 'opencv'
    interpret: bool = False  # run Pallas kernels in interpreter mode (CPU CI)
    # Phase-2 hysteresis continuation form on the megakernel path (STATIC —
    # it changes the compiled program). 'auto' (default): the size policy
    # of megakernel.canny_mega_pipeline — XLA at <=1080p, where the mere
    # PRESENCE of the untaken Pallas branch costs ~12 us/frame and phase 2
    # is adversarial-only; Pallas on mega-frames, where phase 2 is
    # scene-typical. 'pallas' is the escape hatch for deployments that
    # EXPECT cap-class inputs (long monotone chains) and will pay the
    # 12 us/frame branch tax for a ~3x cheaper taken continuation (1080p
    # spiral through the engine: ~1.9 ms XLA -> ~1.2 ms Pallas,
    # BENCH_TABLE.md). 'xla' forces the portable form everywhere. 'split'
    # is the 8K-class column-split form ('auto' picks it there — the
    # monolithic scan kernel does not compile at those plane shapes);
    # it is a multi-tile executor, so cap-TRUNCATED adversarial outputs
    # follow the docs/parity.md carve-out (converged outputs are
    # bit-identical across all forms; forcing 'xla' restores single-chip
    # truncation identity at the r4 escalation cost).
    continuation: str = "auto"  # 'auto' | 'pallas' | 'xla' | 'split'

    def __post_init__(self) -> None:
        if self.kernel_size not in GAUSSIAN_TAPS:
            raise ValueError(f"kernel_size must be one of {sorted(GAUSSIAN_TAPS)}")
        if self.norm not in ("l1", "l2"):
            raise ValueError("norm must be 'l1' or 'l2'")
        if self.channels not in (1, 3):
            raise ValueError("channels must be 1 (mono) or 3 (BGR)")
        if self.backend not in ("auto", "pallas", "xla"):
            raise ValueError("backend must be 'auto', 'pallas' or 'xla'")
        if self.parity not in ("reference", "opencv"):
            raise ValueError("parity must be 'reference' or 'opencv'")
        if self.continuation not in ("auto", "pallas", "xla", "split"):
            raise ValueError(
                "continuation must be 'auto', 'pallas', 'xla' or 'split'"
            )
        if self.grad_coeff not in (1, 2, 4, 8):
            # The exact-integer display magnitude (isqrt(m)*coeff)//8 equals
            # the reference's trunc(coeff*sqrt(m)/8) only when coeff divides
            # 8 (cannyEdgeD.cu:28,195 uses 4).
            raise ValueError("grad_coeff must be 1, 2, 4 or 8")
        if self.height <= 0 or self.width <= 0:
            raise ValueError("height/width must be positive")
        side = max(self.height, self.width)
        if self.hysteresis_inner_steps is None:
            # Derived default (frozen dataclass, hence object.__setattr__):
            # 32 in the 4K band amortizes the per-round convergence check
            # over the bigger state; 16 everywhere else. Scene propagation
            # depth does NOT grow with the frame diameter, and the waste
            # of overshooting convergence grows with both the step count
            # and the state size — at 8K a ds=32 round costs ~146 µs and
            # the scene measures FASTER at 16 (1989 vs 2101 µs,
            # tools/megaframe_ds_probe.py; 4K: 740 at 32 vs 750 at 48).
            object.__setattr__(
                self,
                "hysteresis_inner_steps",
                32 if 2048 < side <= 4096 else 16,
            )
        elif self.hysteresis_inner_steps < 1:
            raise ValueError("hysteresis_inner_steps must be >= 1")
        if self.hysteresis_scan_after is None:
            # Derived default: ~2x the slowest measured scene's phase-1
            # convergence (31 rounds at 1080p/ks3, 15 at 4K with the
            # bigger inner_steps above) — see the field comment.
            object.__setattr__(
                self, "hysteresis_scan_after", 64 if side <= 2048 else 32
            )
        elif self.hysteresis_scan_after < 1:
            raise ValueError("hysteresis_scan_after must be >= 1")
        cap = self.threshold_cap
        if not (0 <= self.low_threshold <= cap) or not (
            0 <= self.high_threshold <= cap
        ):
            raise ValueError(
                f"thresholds must be in [0, {cap}] for parity='{self.parity}'"
            )
        if self.low_threshold > self.high_threshold:
            raise ValueError(
                f"low_threshold ({self.low_threshold}) must be <= "
                f"high_threshold ({self.high_threshold})"
            )

    @property
    def threshold_cap(self) -> int:
        """Largest meaningful threshold for the configured parity domain:
        255 for the reference's uint8 magnitudes; the raw Sobel magnitude
        ceiling (1443 L2 / 2040 L1, rounded up) for 'opencv' parity."""
        return 255 if self.parity == "reference" else 2048

    def with_thresholds(self, low: int, high: int) -> "CannyConfig":
        cap = self.threshold_cap
        low = max(0, min(cap, int(low)))
        high = max(0, min(cap, int(high)))
        if low > high:
            low = high
        return dataclasses.replace(self, low_threshold=low, high_threshold=high)

    @property
    def halo(self) -> int:
        """Total stencil halo from mono to threshold (rows/cols each side)."""
        return self.kernel_size // 2 + 1 + 1  # gaussian + sobel + nms
