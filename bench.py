"""Benchmark: path-tracing throughput on the flagship Cornell-box scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Default metric (the BASELINE.json NORTH STAR, driver-visible per VERDICT
round-2 item 4): fwd+bwd Mpaths/s — differentiable Cornell render at 1080p,
64 spp, depth 50, one full loss->gradient step over ALL trainable parameter
families (tex_color + fuzz + IOR + sphere geometry), fused Pallas forward +
fused in-kernel backward (parallel.train.make_kernel_render). Paths are
counted once, so the value is directly comparable to forward-only numbers.
The same line carries the forward-only reference-default workload
(600px spp16 d50) under the "forward_*" keys so both metrics are recorded
every round.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
compares against this repo's own first honest TPU measurement — the pure-JAX
wavefront path — recorded in BENCH_BASELINE.json.

BENCH_MODE=forward reverts to the forward-only metric as the headline;
BENCH_ENGINE=jax times the pure-JAX path instead of the fused kernel.

Timing note: values are fetched to host (np.asarray), not just
block_until_ready'd — under the axon TPU tunnel a faulted kernel can report
ready without data, which silently times nothing.
"""
import json
import math
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import real_time_ray_tracing_engine_tpu as rt
    from real_time_ray_tracing_engine_tpu.models import camera as cam_mod
    from real_time_ray_tracing_engine_tpu.models.render import (
        baked_render_pass, pick_engine)
    from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene

    width = int(os.environ.get("BENCH_WIDTH", "600"))
    spp = int(os.environ.get("BENCH_SPP", "16"))
    depth = int(os.environ.get("BENCH_DEPTH", "50"))
    engine = os.environ.get("BENCH_ENGINE", "auto")
    forward_only = os.environ.get("BENCH_MODE", "fwd_bwd") == "forward"

    scene = rt.builders.cornell_box()
    scene.camera.image_width = width
    flat = compile_scene(scene)
    cam = cam_mod.derive(scene.camera)
    w, h = cam_mod.image_size(scene.camera)
    seed = jnp.asarray(0, jnp.uint32)
    eng = pick_engine(flat, engine)

    def run(sample_start):
        if eng == "pallas":
            # capped + lane-compacted schedule: the production forward path
            # (models.render auto schedule; recovers straggler-lane idle
            # time — round-3/4 measurements in BASELINE.md)
            from real_time_ray_tracing_engine_tpu.ops.wavefront_pallas \
                import render_pass_pallas_compacted
            return render_pass_pallas_compacted(
                flat, cam, seed, jnp.asarray(sample_start, jnp.int32),
                width=w, height=h, n_strata=10, max_depth=depth,
                n_samples=spp, sky_gradient=False,
                interpret=jax.default_backend() == "cpu")
        fn = baked_render_pass(
            flat, width=w, height=h, tile_rows=min(h, 120), n_strata=10,
            max_depth=depth, sky_gradient=False, n_samples=spp)
        return fn(cam, seed, jnp.asarray(sample_start, jnp.int32))

    reps = 3

    # reps chain DEVICE-SIDE in one jitted scan with a single host fetch
    # (VERDICT round-3 item 3): under the axon tunnel a per-rep dispatch +
    # fetch costs ~40 ms, which at 600px dwarfs the pass itself and made
    # BENCH_r03's forward number measure the tunnel, not the kernel
    @jax.jit
    def run_chain(_):
        def body(acc, i):
            return acc + run((i + 1) * spp).sum(), None
        acc, _ = jax.lax.scan(
            body, jnp.asarray(0.0, jnp.float32),
            jnp.arange(reps, dtype=jnp.int32))
        return acc                  # scalar: timing excludes image fetch

    out = np.asarray(run(0))                      # warmup/compile + fetch
    assert np.isfinite(out).all(), "non-finite radiance"
    out = np.asarray(run_chain(0))                # compile the chain

    # best of two chained runs: the axon tunnel shows +-15-20% run-to-run
    # variance on identical binaries (BASELINE.md measurement note)
    dt = math.inf
    for _ in range(2):
        t0 = time.perf_counter()
        out = np.asarray(run_chain(0))
        dt = min(dt, (time.perf_counter() - t0) / reps)

    mpaths_s = w * h * spp / dt / 1e6
    vs = 1.0
    if os.path.exists("BENCH_BASELINE.json"):
        with open("BENCH_BASELINE.json") as f:
            base = json.load(f).get("value", 0.0)
        if base:
            vs = mpaths_s / base

    fwd_line = {
        "metric": f"cornell_{w}x{h}_spp{spp}_d{depth}_paths_throughput_{eng}",
        "value": round(mpaths_s, 4),
        "unit": "Mpaths/s",
        "vs_baseline": round(vs, 4),
    }
    if forward_only:
        print(json.dumps(fwd_line))
        return
    # north-star headline + the forward number as extra keys, ONE line
    bench_fwd_bwd(depth, fwd_line)


def bench_fwd_bwd(depth=50, fwd_line=None):
    """North-star metric: fwd+bwd Mpaths/s at 1080p 64 spp (BASELINE.json),
    full loss->gradient step over EVERY trainable parameter family."""
    import real_time_ray_tracing_engine_tpu as rt
    from real_time_ray_tracing_engine_tpu.models import camera as cam_mod
    from real_time_ray_tracing_engine_tpu.parallel import train
    from real_time_ray_tracing_engine_tpu.parallel.mesh import \
        make_render_mesh
    from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene

    w, h = 1920, 1080
    n_strata = 8                        # 64 spp
    spp = n_strata * n_strata
    scene = rt.builders.cornell_box()
    scene.camera.image_width = w
    scene.camera.aspect_ratio = w / h
    flat = compile_scene(scene)
    cam = cam_mod.derive(scene.camera)
    mesh = make_render_mesh()
    render = train.make_kernel_render(
        flat, mesh=mesh, width=w, height=h, n_strata=n_strata,
        max_depth=depth)
    target = jnp.zeros((h, w, 3), jnp.float32)

    @jax.jit
    def loss_grad(params, seed_f):
        def loss(p):
            img = render(p, cam, seed_f)
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss)(params)

    params = train.get_params(flat)        # ALL trainable families
    l, g = loss_grad(params, jnp.asarray(0.0))
    assert np.isfinite(np.asarray(l))
    for k in params:
        assert np.isfinite(np.asarray(g[k])).all(), k

    reps = 3

    # device-chained reps, one fetch (see main's run_chain)
    @jax.jit
    def chain(params):
        def body(acc, i):
            l, g = loss_grad(params, i.astype(jnp.float32) + 1.0)
            return acc + l + g["tex_color"].sum(), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc
    np.asarray(chain(params))                     # compile
    dt = math.inf                 # best of two (tunnel variance; see main)
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(chain(params))
        dt = min(dt, (time.perf_counter() - t0) / reps)

    mpaths_s = w * h * spp / dt / 1e6
    vs = 1.0
    if os.path.exists("BENCH_BASELINE.json"):
        with open("BENCH_BASELINE.json") as f:
            base = json.load(f).get("value", 0.0)
        if base:
            vs = mpaths_s / base
    line = {
        "metric": f"cornell_{w}x{h}_spp{spp}_d{depth}_fwd_bwd_full_params",
        "value": round(mpaths_s, 4),
        "unit": "Mpaths/s",
        "vs_baseline": round(vs, 4),
    }
    if fwd_line is not None:
        line["forward_metric"] = fwd_line["metric"]
        line["forward_value"] = fwd_line["value"]
        line["forward_vs_baseline"] = fwd_line["vs_baseline"]
    try:
        line["adjoint_metric"], line["adjoint_value"] = bench_adjoint_full()
    except Exception as e:                      # never sink the headline
        line["adjoint_error"] = f"{type(e).__name__}: {e}"[:160]
    print(json.dumps(line))


def bench_adjoint_full():
    """Round-5 capability metric: bouncing_spheres FULL-family fwd+bwd
    (2,013 hard slots through the in-kernel adjoint backward — the
    workload that previously fell to the ~600x pure-JAX replay)."""
    import real_time_ray_tracing_engine_tpu as rt
    from real_time_ray_tracing_engine_tpu.models import camera as cam_mod
    from real_time_ray_tracing_engine_tpu.parallel import train
    from real_time_ray_tracing_engine_tpu.parallel.mesh import \
        make_render_mesh
    from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene

    w, h, n_strata, depth = 400, 225, 3, 50
    spp = n_strata * n_strata
    scene = rt.builders.bouncing_spheres()
    scene.camera.image_width = w
    scene.camera.aspect_ratio = w / h
    flat = compile_scene(scene)
    cam = cam_mod.derive(scene.camera)
    render = train.make_kernel_render(
        flat, mesh=make_render_mesh(), width=w, height=h,
        n_strata=n_strata, max_depth=depth)
    target = jnp.zeros((h, w, 3), jnp.float32)
    params = train.get_params(flat)

    @jax.jit
    def loss_grad(params, seed_f):
        def loss(p):
            return jnp.mean((render(p, cam, seed_f) - target) ** 2)
        return jax.value_and_grad(loss)(params)

    reps = 2

    @jax.jit
    def chain(params):
        def body(acc, i):
            l, g = loss_grad(params, i.astype(jnp.float32) + 1.0)
            return acc + l + g["sph_center"].sum() + g["tex_color"].sum(), \
                None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc
    assert np.isfinite(np.asarray(chain(params)))     # compile + check
    dt = math.inf
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(chain(params))
        dt = min(dt, (time.perf_counter() - t0) / reps)
    return (f"bouncing_{w}x{h}_spp{spp}_d{depth}_fwd_bwd_full_params_"
            "adjoint_2013_slots", round(w * h * spp / dt / 1e6, 4))


if __name__ == "__main__":
    main()
