"""Profiling: rays/s meter, jax.profiler traces, and a VPU roofline estimate.

The reference's only instrumentation is a per-scanline progress log
(StaticCamera.cpp:63-65) and a once-per-second FPS overlay that doubles as
the adaptive-tile control signal (DynamicCamera.cpp:182-194). SURVEY.md §5
asks the TPU build for more: jax.profiler traces plus a rays/s meter derived
from (W*H*spp*avg_depth)/wall and a roofline comparison.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

# Approximate peak vector (VPU) throughput per chip, f32 FMA ops/s.
# v5e: 4 MXU-adjacent VPUs x (8x128) lanes x ~0.94 GHz x 2 (fma) per core.
# These are order-of-magnitude roofline anchors, not marketing numbers.
_VPU_PEAK_FLOPS = {
    "TPU v4": 4.3e12,
    "TPU v5 lite": 1.9e12,
    "TPU v5e": 1.9e12,
    "TPU v5p": 4.6e12,
    "TPU v6e": 3.7e12,
}

# Measured cost of one wavefront bounce per ray lane in the fused kernel,
# in VPU op equivalents (intersection over ~24 Cornell prims + MIS shading
# + RNG). Used only for the roofline ratio; override per scene if needed.
DEFAULT_OPS_PER_BOUNCE = 1200.0


@dataclasses.dataclass
class RenderStats:
    """Throughput report for one render (or bench rep)."""
    width: int
    height: int
    spp: int
    wall_s: float
    avg_depth: float = 6.0          # mean path length, not max_depth
    device_kind: str = ""

    @property
    def paths(self) -> int:
        return self.width * self.height * self.spp

    @property
    def paths_per_s(self) -> float:
        return self.paths / self.wall_s

    @property
    def rays_per_s(self) -> float:
        """Bounce rays per second: paths * average bounce count / wall."""
        return self.paths * self.avg_depth / self.wall_s

    def roofline_fraction(self,
                          ops_per_bounce: float = DEFAULT_OPS_PER_BOUNCE
                          ) -> float | None:
        """Fraction of the chip's VPU peak this render achieved, given the
        per-bounce op cost model. None when the device is unknown."""
        peak = None
        for k, v in _VPU_PEAK_FLOPS.items():
            if self.device_kind.startswith(k):
                peak = v
                break
        if peak is None:
            return None
        return self.rays_per_s * ops_per_bounce / peak

    def report(self) -> str:
        lines = [
            f"{self.width}x{self.height} @ {self.spp}spp in "
            f"{self.wall_s:.3f}s",
            f"  {self.paths_per_s / 1e6:.2f} Mpaths/s, "
            f"{self.rays_per_s / 1e6:.2f} Mrays/s "
            f"(avg depth {self.avg_depth:.1f})",
        ]
        frac = self.roofline_fraction()
        if frac is not None:
            lines.append(f"  ~{100 * frac:.1f}% of {self.device_kind} "
                         f"VPU roofline")
        return "\n".join(lines)


def device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:
        return ""


@contextlib.contextmanager
def timed(stats_kwargs: dict):
    """Context manager yielding a RenderStats filled with wall time:

        with timed(dict(width=w, height=h, spp=s)) as get:
            render(...)
        print(get().report())
    """
    box = {}
    t0 = time.perf_counter()

    def get() -> RenderStats:
        return box["stats"]

    yield get
    box["stats"] = RenderStats(wall_s=time.perf_counter() - t0,
                               device_kind=device_kind(), **stats_kwargs)


@contextlib.contextmanager
def profiler_trace(log_dir: str = "logs/jax_trace"):
    """jax.profiler trace around a render — open in TensorBoard/XProf.

    The TPU analogue of the reference's (absent) per-phase profiling
    (SURVEY.md §5 item 1)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
