"""Wavefront-schedule throughput harness (single vs capped+compacted).

SUPERSEDED for absolute numbers (round 5): this harness still fetches the
accumulated IMAGE per chain (~40 ms through the axon tunnel), so its
values undercount the kernel; use `python bench.py` (scalar-fetch
chained) for recorded throughput. Kept for quick A/B of schedule SHAPES,
where the constant fetch cost cancels.

Methodology note (round 3): under the axon TPU tunnel a per-rep host fetch
costs ~40 ms and buries the kernel time, so each variant runs REPS passes
device-side inside one jitted lax.scan and fetches once; reported Mpaths/s
divides by REPS. Run on a real TPU:

    python scripts/bench_sched.py [spp] [n_strata] [reps]

Measured v5e (Cornell 600px d50, 2026-08-21): spp16 single 75 ->
compacted 100 Mpaths/s; spp100 single ~100 -> compacted ~140.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import real_time_ray_tracing_engine_tpu as rt  # noqa: E402
from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene  # noqa: E402
from real_time_ray_tracing_engine_tpu.models import camera as cam_mod  # noqa: E402
from real_time_ray_tracing_engine_tpu.ops.wavefront_pallas import (  # noqa: E402
    render_pass_pallas, render_pass_pallas_compacted)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_strata = int(sys.argv[2]) if len(sys.argv) > 2 else max(
        1, int(round(spp ** 0.5)))
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    scene = rt.builders.cornell_box()
    scene.camera.image_width = 600
    flat = compile_scene(scene)
    cam = cam_mod.derive(scene.camera)
    w, h = cam_mod.image_size(scene.camera)
    seed = jnp.asarray(0, jnp.uint32)
    interp = jax.default_backend() == "cpu"
    kw = dict(width=w, height=h, n_strata=n_strata, max_depth=50,
              n_samples=spp, interpret=interp)

    variants = {
        "single": lambda s0: render_pass_pallas(flat, cam, seed, s0, **kw),
        "compacted2": lambda s0: render_pass_pallas_compacted(
            flat, cam, seed, s0, **kw),
        "compacted3": lambda s0: render_pass_pallas_compacted(
            flat, cam, seed, s0, phases=3, **kw),
    }
    jitted = {}
    for name, f in variants.items():
        @jax.jit
        def many(s0, f=f):
            def body(c, k):
                return c + f(s0 + k * spp), None
            acc, _ = jax.lax.scan(body, jnp.zeros((h, w, 3)),
                                  jnp.arange(reps))
            return acc
        np.asarray(many(jnp.asarray(0, jnp.int32)))       # compile + warm
        jitted[name] = many
    for _ in range(2):
        line = []
        for name, f in jitted.items():
            t0 = time.perf_counter()
            np.asarray(f(jnp.asarray(spp, jnp.int32)))
            dt = (time.perf_counter() - t0) / reps
            line.append(f"{name} {w * h * spp / dt / 1e6:.1f}")
        print(f"spp{spp} Mpaths/s:", "  ".join(line), flush=True)


if __name__ == "__main__":
    main()
