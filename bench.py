"""Benchmark: path-tracing throughput on the flagship Cornell-box scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: millions of camera-path samples traced per second (W*H*spp / wall),
max_depth=50 wavefront bounces per path, Cornell box at the reference's
default workload shape (600px, CLI.hpp:11-13). The reference publishes no
throughput numbers (BASELINE.md), so vs_baseline compares against this
repo's own recorded first TPU measurement in BENCH_BASELINE.json (1.0 when
absent or when this run IS the baseline).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    import real_time_ray_tracing_engine_tpu as rt
    from real_time_ray_tracing_engine_tpu.models.render import _render_pass
    from real_time_ray_tracing_engine_tpu.models import camera as cam_mod
    from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene

    width = int(os.environ.get("BENCH_WIDTH", "600"))
    spp = int(os.environ.get("BENCH_SPP", "16"))
    depth = int(os.environ.get("BENCH_DEPTH", "50"))

    scene = rt.builders.cornell_box()
    scene.camera.image_width = width
    flat = compile_scene(scene)
    cam = cam_mod.derive(scene.camera)
    w, h = cam_mod.image_size(scene.camera)

    kwargs = dict(width=w, height=h, tile_rows=min(h, 128), n_strata=10,
                  max_depth=depth, sky_gradient=False, n_samples=spp)
    seed = jnp.asarray(0, jnp.uint32)

    # warmup/compile
    out = _render_pass(flat, cam, seed, jnp.asarray(0, jnp.int32), **kwargs)
    out.block_until_ready()

    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out = _render_pass(flat, cam, seed, jnp.asarray(i * spp, jnp.int32),
                           **kwargs)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    samples = w * h * spp
    mpaths_s = samples / dt / 1e6

    base = 1.0
    vs = 1.0
    if os.path.exists("BENCH_BASELINE.json"):
        with open("BENCH_BASELINE.json") as f:
            base = json.load(f).get("value", mpaths_s)
        vs = mpaths_s / base if base else 1.0

    print(json.dumps({
        "metric": f"cornell_{w}x{h}_spp{spp}_d{depth}_paths_throughput",
        "value": round(mpaths_s, 4),
        "unit": "Mpaths/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
