"""Render drivers: batch (static) and progressive accumulation.

Replaces the reference StaticCamera (StaticCamera.cpp:25-131 scanline loop,
one ThreadPool job per pixel) and the progressive accumulation core of
DynamicCamera (DynamicCamera.cpp:105-175: one stratum (s_i, s_j) per frame
until sqrt_spp^2 samples taken). Here the image is rendered in jit-compiled
row-tile passes: rays for a whole tile are traced as one wavefront batch, and
samples accumulate either inside one jit scan (batch render) or one stratum
per `step()` (progressive), with the accumulation buffer + sample counter as
the resumable checkpoint state.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..scene.schema import CameraConfig, Scene
from ..scene.flat import FlatScene
from ..scene.compile import compile_scene
from ..utils import rng
from ..ops.integrator import trace
from . import camera as cam_mod


def default_tile_rows(width: int, height: int, n_prims: int) -> int:
    """Bound the (rays x prims) intersection table to ~32M entries."""
    budget = 32 * 1024 * 1024
    rows = max(1, budget // max(1, width * max(n_prims, 1)))
    return int(min(rows, height))


# Scene-baked pass cache: on TPU, XLA runs the integrator ~11x faster when
# the scene tables are compile-time CONSTANTS (folded gathers/selects) than
# when they are traced arguments. Rendering recompiles per scene — the exact
# analogue of the reference's scene-to-device compile pass
# (CudaSceneInitialization.cuh:249). Keyed by object identity + statics; the
# cache holds the FlatScene alive so ids cannot be reused, and is bounded
# (LRU) so a scene-per-request service does not leak host+device memory.
_BAKED_CACHE: "dict" = {}
_BAKED_CACHE_MAX = 8


def baked_render_pass(flat: FlatScene, **statics):
    """jitted (cam, seed, sample_start) -> radiance-sum image with `flat`
    closed over as constants. statics = _render_pass's keyword args."""
    key = (id(flat), tuple(sorted(statics.items())))
    hit = _BAKED_CACHE.pop(key, None)
    if hit is not None:
        _BAKED_CACHE[key] = hit          # reinsert: most-recently-used
        return hit[1]

    @jax.jit
    def fn(cam, seed, sample_start):
        return _render_pass(flat, cam, seed, sample_start, **statics)

    while len(_BAKED_CACHE) >= _BAKED_CACHE_MAX:
        _BAKED_CACHE.pop(next(iter(_BAKED_CACHE)))   # evict LRU
    _BAKED_CACHE[key] = (flat, fn)
    return fn


@partial(jax.jit, static_argnames=("width", "height", "tile_rows",
                                   "n_strata", "max_depth", "sky_gradient",
                                   "n_samples"))
def _render_pass(scene: FlatScene, cam: cam_mod.CameraState, seed,
                 sample_start, *, width: int, height: int, tile_rows: int,
                 n_strata: int, max_depth: int, sky_gradient: bool,
                 n_samples: int):
    """Sum of `n_samples` consecutive stratified samples for the full image.

    Returns (height, width, 3) radiance sum (not averaged).
    """
    n_tiles = -(-height // tile_rows)

    def tile_fn(tile_idx):
        rows = tile_idx * tile_rows + jnp.arange(tile_rows)
        pix = (rows[:, None] * width + jnp.arange(width)[None, :]).reshape(-1)
        # rows beyond the image render pixel 0's rays and are cropped later
        pixc = jnp.minimum(pix, width * height - 1)

        def sample_body(acc, k):
            s = sample_start + k
            keys = rng.ray_keys(seed, pixc, jnp.broadcast_to(s, pixc.shape))
            org, dr, tm = cam_mod.generate_rays(cam, width, pixc, s,
                                                n_strata, keys)
            rad = trace(scene, org, dr, tm, keys, cam.background,
                        max_depth=max_depth, sky_gradient=sky_gradient)
            return acc + rad, None

        acc0 = jnp.zeros((tile_rows * width, 3), jnp.float32)
        acc, _ = jax.lax.scan(sample_body, acc0, jnp.arange(n_samples))
        return acc.reshape(tile_rows, width, 3)

    tiles = jax.lax.map(tile_fn, jnp.arange(n_tiles))
    img = tiles.reshape(n_tiles * tile_rows, width, 3)
    return img[:height]


def pick_engine(flat: FlatScene, engine: str = "auto") -> str:
    """Resolve the compute path: "pallas" (fused wavefront megakernel) or
    "jax" (pure-JAX wavefront — the oracle/fallback, and the only
    differentiable path).

    "auto" picks pallas on the TPU backend for scenes the kernel supports,
    mirroring the reference's GPU-with-CPU-fallback structure
    (StaticCamera.cpp:166-207). The fused kernel lowers through Mosaic
    (pltpu.SMEM/VMEM memory spaces), so non-TPU accelerators (CUDA/ROCm/
    METAL) take the jax engine rather than failing to lower. When a feature
    cap knocks the scene off the fast path, the reason is logged — silent
    1000x degradations are worse than a warning."""
    import sys
    import jax as _jax
    from ..ops.wavefront_pallas import pallas_gate_reason
    reason = pallas_gate_reason(flat)
    if engine == "auto":
        on_tpu = _jax.default_backend() == "tpu"
        if on_tpu and reason is not None:
            print(f"[INFO] engine=jax (fused kernel unavailable: {reason})",
                  file=sys.stderr)
        return "pallas" if (on_tpu and reason is None) else "jax"
    if engine == "pallas" and reason is not None:
        raise ValueError(f"scene outside the pallas kernel's gate: {reason}; "
                         "use engine='jax'")
    return engine


def render(scene: Scene | FlatScene, cfg: CameraConfig | None = None, *,
           seed: int = 0, use_bvh: bool = False, tile_rows: int | None = None,
           samples_per_batch: int = 4, spp: int | None = None,
           progress=None, engine: str = "auto",
           schedule: str = "auto", caps: tuple | None = None) -> jnp.ndarray:
    """Render a full image; returns (H, W, 3) linear float32.

    Accepts either a schema Scene (compiled here) or a prebuilt FlatScene +
    explicit CameraConfig. engine: "auto" | "pallas" | "jax" (pick_engine).

    schedule (pallas engine only): "auto" | "single" | "compacted".
    "compacted" runs the capped + lane-compacted wavefront
    (ops.wavefront_pallas.render_pass_pallas_compacted), which recovers the
    straggler-lane idle tail at medium/high spp; "auto" picks it for
    single-pass renders of >= 8 samples. caps overrides the compacted
    schedule's per-phase bounce-iteration caps (e.g. (20, 20); default is
    mode-aware, BASELINE.md).
    """
    if isinstance(scene, Scene):
        cfg = cfg or scene.camera
        flat = compile_scene(scene, use_bvh=use_bvh)
    else:
        assert cfg is not None, "FlatScene input needs an explicit CameraConfig"
        flat = scene

    width, height = cam_mod.image_size(cfg)
    n_strata = cam_mod.sqrt_spp(
        cfg if spp is None else
        CameraConfig(**{**cfg.__dict__, "samples_per_pixel": spp}))
    total = n_strata * n_strata
    cam = cam_mod.derive(cfg)
    tr = tile_rows or default_tile_rows(width, height, flat.n_prims)
    eng = pick_engine(flat, engine)
    if eng == "pallas":
        from ..ops.wavefront_pallas import (render_pass_pallas,
                                            render_pass_pallas_compacted)
        import jax as _jax
        interp = _jax.default_backend() == "cpu"
        # lane regeneration amortizes dead-lane waste across samples: the
        # fewer passes, the better (one pass unless progress wants batches)
        if progress is None:
            samples_per_batch = total

    acc = jnp.zeros((height, width, 3), jnp.float32)
    s = 0
    while s < total:
        k = min(samples_per_batch, total - s)
        if eng == "pallas":
            # auto: compacted only where the idle tail costs real time —
            # compiled TPU runs at medium/high spp (interpret mode keeps the
            # single pass: one kernel, half the compile, same image)
            compacted = (schedule == "compacted"
                         or (schedule == "auto" and k >= 8 and not interp))
            pass_fn = (render_pass_pallas_compacted if compacted
                       else render_pass_pallas)
            # `caps is not None` (not truthiness): an explicit empty tuple
            # is still a user request and must not silently vanish
            if caps is not None and not compacted:
                import sys
                print("[INFO] caps= ignored: the compacted schedule is not "
                      f"selected (schedule={schedule!r}, "
                      f"{k} samples this pass; caps apply only to "
                      "schedule='compacted' or auto-compacted passes)",
                      file=sys.stderr)
            extra = ({"caps": caps}
                     if (compacted and caps is not None) else {})
            try:
                acc = acc + pass_fn(
                    flat, cam, seed, s, width=width, height=height,
                    n_strata=n_strata, max_depth=cfg.max_depth, n_samples=k,
                    sky_gradient=cfg.sky_gradient, interpret=interp,
                    **extra)
                s += k
            except Exception as e:            # Mosaic lowering / XLA runtime
                eng = _fallback_to_jax(e)     # failure -> degrade, keep `s`
                continue
        else:
            pass_fn = baked_render_pass(
                flat, width=width, height=height, tile_rows=tr,
                n_strata=n_strata, max_depth=cfg.max_depth,
                sky_gradient=cfg.sky_gradient, n_samples=k)
            acc = acc + pass_fn(cam, seed, s)
            s += k
        if progress is not None:
            progress(s, total)
    return acc / total


def _fallback_to_jax(err: Exception) -> str:
    """Log a fused-kernel failure and return the fallback engine name.

    The reference degrades to its CPU renderer on *every* device error
    (StaticCamera.cpp:169-178, 251, 275...); the analogue here is the
    pure-JAX wavefront, which renders the identical estimator (same RNG
    streams), just slower."""
    import sys
    msg = str(err).splitlines()[0][:200]
    print(f"[ERROR] pallas kernel failed ({type(err).__name__}: {msg}); "
          "falling back to engine=jax", file=sys.stderr)
    return "jax"


@partial(jax.jit, static_argnames=("cols", "rows"))
def _preview_bytes(acc, n_samples_f, cols: int, rows: int):
    """(H, W, 3) accumulation -> (rows, cols, 3) uint8 preview on device
    (nearest-neighbor select, then the reference gamma/clamp byte rule)."""
    from ..utils.color import to_bytes
    h, w, _ = acc.shape
    yi = jnp.minimum((jnp.arange(rows) * h) // rows, h - 1)
    xi = jnp.minimum((jnp.arange(cols) * w) // cols, w - 1)
    return to_bytes(acc[yi[:, None], xi[None, :]] / n_samples_f)


class ProgressiveRenderer:
    """Progressive accumulation with camera motion and checkpointing.

    Mirrors DynamicCamera's loop state: accumulation buffer + samples_taken,
    one stratum per step (DynamicCamera.cpp:105-175), reset on camera move
    (:271-277). The (buffer, counter, seed) triple is the checkpoint — unlike
    the reference, whose progressive state dies with the process, `save`/`load`
    make re-renders resumable (SURVEY.md §5 checkpoint/resume).
    """

    def __init__(self, scene: Scene, *, use_bvh: bool = False, seed: int = 0,
                 tile_rows: int | None = None, engine: str = "auto"):
        self.scene_schema = scene
        self.cfg = scene.camera
        self.flat = compile_scene(scene, use_bvh=use_bvh)
        self.seed = seed
        self.width, self.height = cam_mod.image_size(self.cfg)
        self.n_strata = cam_mod.sqrt_spp(self.cfg)
        self.tile_rows = tile_rows or default_tile_rows(
            self.width, self.height, self.flat.n_prims)
        self.cam = cam_mod.derive(self.cfg)
        self.engine = pick_engine(self.flat, engine)
        self.reset()

    # ------------------------------------------------------------ state
    def reset(self):
        self.acc = jnp.zeros((self.height, self.width, 3), jnp.float32)
        self.samples_taken = 0

    @property
    def converged(self) -> bool:
        return self.samples_taken >= self.n_strata * self.n_strata

    def step(self, k: int = 1) -> bool:
        """Accumulate k strata (clamped to what remains); True if work done.

        k > 1 renders multiple samples in ONE fused pass — the adaptive
        viewer raises it when the frame rate allows, the analogue of the
        reference's FPS-keyed tile resizing (DynamicCamera.cpp:190-193)."""
        if self.converged:
            return False
        k = max(1, min(k, self.n_strata * self.n_strata
                       - self.samples_taken))
        if self.engine == "pallas":
            from ..ops.wavefront_pallas import (render_pass_pallas,
                                                render_pass_pallas_compacted)
            import jax as _jax
            interp = _jax.default_backend() == "cpu"
            # big adaptive steps benefit from the compacted schedule just
            # like batch renders (see render()); small steps keep the
            # single pass (one kernel launch, lower latency per frame)
            pass_fn = (render_pass_pallas_compacted
                       if k >= 8 and not interp else render_pass_pallas)
            try:
                self.acc = self.acc + pass_fn(
                    self.flat, self.cam, self.seed, self.samples_taken,
                    width=self.width, height=self.height,
                    n_strata=self.n_strata, max_depth=self.cfg.max_depth,
                    n_samples=k, sky_gradient=self.cfg.sky_gradient,
                    interpret=interp)
                self.samples_taken += k
                return True
            except Exception as e:
                self.engine = _fallback_to_jax(e)
        pass_fn = baked_render_pass(
            self.flat, width=self.width, height=self.height,
            tile_rows=self.tile_rows, n_strata=self.n_strata,
            max_depth=self.cfg.max_depth,
            sky_gradient=self.cfg.sky_gradient, n_samples=k)
        self.acc = self.acc + pass_fn(self.cam, self.seed,
                                      self.samples_taken)
        self.samples_taken += k
        return True

    def image(self) -> jnp.ndarray:
        return self.acc / max(1, self.samples_taken)

    def preview(self, cols: int, rows: int) -> np.ndarray:
        """Terminal-resolution gamma-byte frame, downsampled ON DEVICE.

        The interactive viewer only displays ~cols x rows cells, but
        fetching the full 600^2 float image through the axon TPU tunnel
        (~100 MB/s) costs ~40 ms/frame and capped the viewer at 8.6
        steps/s (round-4 BASELINE.md). Nearest-neighbor-select + gamma on
        device fetches rows*cols*3 BYTES instead (round-5 VERDICT item
        5). Selection commutes with the per-pixel gamma/clamp, so the
        frame equals _downsample(to_bytes(image()))."""
        return np.asarray(_preview_bytes(
            self.acc,
            jnp.asarray(max(1, self.samples_taken), jnp.float32),
            cols, rows))

    # ----------------------------------------------------- camera motion
    def move_camera(self, delta):
        """Translate lookfrom/lookat (DynamicCamera WASD handling,
        DynamicCamera.cpp:204-278) and reset accumulation."""
        d = tuple(float(x) for x in delta)
        c = self.cfg
        self.cfg = CameraConfig(**{
            **c.__dict__,
            "lookfrom": tuple(a + b for a, b in zip(c.lookfrom, d)),
            "lookat": tuple(a + b for a, b in zip(c.lookat, d))})
        self.cam = cam_mod.derive(self.cfg)
        self.reset()

    def set_spp(self, spp: int):
        """+/- samples control (DynamicCamera.cpp:239-252)."""
        self.cfg = CameraConfig(**{**self.cfg.__dict__,
                                   "samples_per_pixel": spp})
        self.n_strata = cam_mod.sqrt_spp(self.cfg)
        self.reset()

    # ------------------------------------------------------- checkpoint
    def save(self, path: str):
        np.savez(path, acc=np.asarray(self.acc),
                 samples_taken=self.samples_taken, seed=self.seed,
                 n_strata=self.n_strata)

    def load(self, path: str):
        d = np.load(path)
        assert int(d["n_strata"]) == self.n_strata, "spp mismatch"
        self.acc = jnp.asarray(d["acc"])
        self.samples_taken = int(d["samples_taken"])
        self.seed = int(d["seed"])
