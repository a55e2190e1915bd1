"""Large-scene throughput harness (VERDICT round-2 item 2 targets).

Measures the fused megakernel on:
  - bouncing_spheres 400x225 spp9 depth50 (485 prims; reference scene,
    main.cpp:73-131) in scan and BVH modes — target >= 20 Mpaths/s
  - a 17^3 = 4913-sphere grid, depth 8 (the >4096-prim regime) — target
    >= 5 Mpaths/s

Usage: python scripts/bench_large.py [scan|bvh|grid|gridbvh|all] [R]
Prints one line per measurement. Run on a real TPU.
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
    render_pass_pallas, render_pass_pallas_compacted, pallas_gate_reason)


def city_scene(n_boxes=50):
    """Box-city: 6*n_boxes+1 quads — the vquad-chunk regime (>64 quads)."""
    rng = np.random.default_rng(3)
    objs = []
    for i in range(n_boxes):
        x, z = rng.uniform(-20, 20, 2)
        hgt = float(rng.uniform(1, 6))
        albedo = tuple(map(float, rng.uniform(0.3, 0.9, 3)))
        objs.append(rt.Box((x, 0, z), (x + 1.5, hgt, z + 1.5),
                           rt.Lambertian(rt.SolidColor(albedo))))
    objs.append(rt.Quad((-40, 0, -40), (80, 0, 0), (0, 0, 80),
                        rt.Lambertian(rt.SolidColor((0.5, 0.5, 0.5)))))
    cam = rt.CameraConfig(aspect_ratio=16 / 9, image_width=400,
                          samples_per_pixel=9, max_depth=6,
                          lookfrom=(30, 12, 30), lookat=(0, 2, 0),
                          sky_gradient=True)
    return rt.Scene(objects=objs, camera=cam, name="city")


def grid_scene(n=17):
    """n^3 lambertian sphere grid under a sky — the >4096-prim regime."""
    objs = []
    rng = np.random.default_rng(0)
    for i in range(n):
        for j in range(n):
            for k in range(n):
                c = (i * 2.0, j * 2.0, k * 2.0)
                albedo = tuple(map(float, rng.uniform(0.2, 0.9, 3)))
                objs.append(rt.Sphere(c, 0.45,
                                      rt.Lambertian(rt.SolidColor(albedo))))
    cam = rt.CameraConfig(aspect_ratio=16 / 9, image_width=400,
                          samples_per_pixel=9, max_depth=8, vfov=40,
                          lookfrom=(n * 3.0, n * 2.2, n * 3.0),
                          lookat=(n * 1.0, n * 1.0, n * 1.0),
                          background=(0.7, 0.8, 1.0))
    return rt.Scene(objects=objs, lights=[], camera=cam, name="grid")


def bench(name, scene, *, use_bvh, depth, spp, R, reps=6, compacted=False):
    """Device-chained reps, ONE scalar fetch, best of two chains: the
    per-run ~1 MB image fetch + dispatch through the axon tunnel costs
    ~20 ms and buried the round-4 kernels (a ~31 ms bouncing pass measured
    as ~50 ms) — see BASELINE.md measurement correction."""
    flat = compile_scene(scene, use_bvh=use_bvh)
    reason = pallas_gate_reason(flat)
    if reason is not None:
        print(f"[{name}] GATED: {reason}")
        return
    cam = cam_mod.derive(scene.camera)
    w, h = cam_mod.image_size(scene.camera)
    seed = jnp.asarray(0, jnp.uint32)
    interp = jax.default_backend() == "cpu"

    def run(s0):
        fn = render_pass_pallas_compacted if compacted else render_pass_pallas
        return fn(
            flat, cam, seed, s0, width=w, height=h,
            n_strata=3, max_depth=depth, n_samples=spp,
            sky_gradient=scene.camera.sky_gradient, rows_per_tile=R,
            interpret=interp)

    @jax.jit
    def chain(s0):
        def body(c, k):
            return c + run(s0 + k * spp).sum(), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), jnp.arange(reps))
        return acc

    t0 = time.perf_counter()
    out = np.asarray(run(jnp.asarray(0, jnp.int32)))
    tc = time.perf_counter() - t0
    assert np.isfinite(out).all()
    float(chain(jnp.asarray(0, jnp.int32)))          # compile the chain
    dt = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        float(chain(jnp.asarray((i + 1) * spp, jnp.int32)))
        dt = min(dt, (time.perf_counter() - t0) / reps)
    mp = w * h * spp / dt / 1e6
    print(f"[{name}] {w}x{h} spp{spp} d{depth} R={R} "
          f"prims={flat.n_prims} bvh={use_bvh}: {mp:.2f} Mpaths/s "
          f"({dt*1e3:.0f} ms/pass, first-pass compile {tc:.0f}s)",
          flush=True)


def bench_sync(name, scene, *, use_bvh, depth, spp, R, reps=2):
    """Bounce-SYNCHRONOUS variant: spp passes of n_samples=1 — no lane
    regeneration, so all lanes in a tile walk the same bounce index and
    primary rays stay a coherent beam for the cluster/BVH culling tests.
    Trades dead-lane spin (no regen amortization) for much tighter
    whole-tile culling on the early bounces, where most of the work is."""
    flat = compile_scene(scene, use_bvh=use_bvh)
    if pallas_gate_reason(flat):
        print(f"[{name}] GATED"); return
    cam = cam_mod.derive(scene.camera)
    w, h = cam_mod.image_size(scene.camera)
    seed = jnp.asarray(0, jnp.uint32)

    def run(s0):
        acc = None
        for s in range(spp):
            img = render_pass_pallas(
                flat, cam, seed, jnp.asarray(s0 + s, jnp.int32), width=w,
                height=h, n_strata=3, max_depth=depth, n_samples=1,
                sky_gradient=scene.camera.sky_gradient, rows_per_tile=R,
                interpret=jax.default_backend() == "cpu")
            acc = img if acc is None else acc + img
        return acc

    out = np.asarray(run(0))
    assert np.isfinite(out).all()
    t0 = time.perf_counter()
    for i in range(reps):
        out = run((i + 1) * spp)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    mp = w * h * spp / dt / 1e6
    print(f"[{name}] SYNC {w}x{h} spp{spp} d{depth} R={R} bvh={use_bvh}: "
          f"{mp:.2f} Mpaths/s ({dt*1e3:.0f} ms/{spp}-pass)", flush=True)


def bigcheck(n=32):
    """Correctness gate for the >16k regime (round-5 VERDICT item 4): the
    lane-BVH and vscan kernels must render the same image on a 32k-sphere
    grid (identical estimator, different traversal)."""
    scene = grid_scene(n)
    scene.camera.image_width = 120
    scene.camera.samples_per_pixel = 4
    flat = compile_scene(scene, use_bvh=True)
    cam = cam_mod.derive(scene.camera)
    w, h = cam_mod.image_size(scene.camera)
    kw = dict(width=w, height=h, n_strata=2, max_depth=4, n_samples=4,
              interpret=jax.default_backend() == "cpu")
    assert os.environ.get("RTX_LANE_BVH") == "1", \
        "run with RTX_LANE_BVH=1 (vscan reference rendered in-process)"
    lane = np.asarray(render_pass_pallas(flat, cam, jnp.uint32(0), 0, **kw))
    os.environ["RTX_LANE_BVH"] = "0"
    ref = np.asarray(render_pass_pallas(flat, cam, jnp.uint32(0), 0, **kw))
    os.environ["RTX_LANE_BVH"] = "1"
    d = np.abs(lane - ref).max()
    rate = np.isclose(lane, ref, rtol=1e-3, atol=1e-3).mean()
    print(f"[bigcheck] grid{n ** 3} lane vs vscan: maxdiff {d:.2e} "
          f"allclose-rate {rate:.4f}", flush=True)
    assert rate > 0.999, rate


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    if which == "bigcheck":
        bigcheck()
    if which == "big":
        # the >16k-prim regime (round-5 VERDICT item 4); RTX_LANE_BVH=1
        # reruns the same scenes on the per-lane skip-link kernel
        mode = "lane" if os.environ.get("RTX_LANE_BVH") == "1" else "vscan"
        for n in (25, 32, 40):
            bench(f"grid{n ** 3}/{mode}", grid_scene(n), use_bvh=True,
                  depth=8, spp=9, R=R)
    if which.startswith("bigc"):
        mode = "lane" if os.environ.get("RTX_LANE_BVH") == "1" else "vscan"
        ns = {"bigc": (25, 32, 40), "bigc25": (25,), "bigc32": (32,),
              "bigc40": (40,)}[which]
        for n in ns:
            bench(f"grid{n ** 3}/{mode}+compacted", grid_scene(n),
                  use_bvh=True, depth=8, spp=9, R=R, compacted=True)
    if which == "scanc":
        bench("bouncing/compacted",
              rt.builders.bouncing_spheres(image_width=400),
              use_bvh=False, depth=50, spp=9, R=R, compacted=True)
    if which == "gridc":
        bench("grid4913/compacted", grid_scene(), use_bvh=False, depth=8,
              spp=9, R=R, compacted=True)
    if which in ("scan", "all"):
        bench("bouncing/scan", rt.builders.bouncing_spheres(image_width=400),
              use_bvh=False, depth=50, spp=9, R=R)
    if which in ("bvh", "all"):
        bench("bouncing/bvh", rt.builders.bouncing_spheres(image_width=400),
              use_bvh=True, depth=50, spp=9, R=R)
    if which in ("city", "all"):
        bench("city301/vquad", city_scene(), use_bvh=False, depth=6, spp=9,
              R=R)
    if which in ("grid", "all"):
        bench("grid4913/scan", grid_scene(), use_bvh=False, depth=8, spp=9,
              R=R)
    if which in ("gridbvh", "all"):
        bench("grid4913/bvh", grid_scene(), use_bvh=True, depth=8, spp=9,
              R=R)
    if which == "sync":
        bench_sync("bouncing/scan", rt.builders.bouncing_spheres(
            image_width=400), use_bvh=False, depth=50, spp=9, R=R)
        bench_sync("grid4913/scan", grid_scene(), use_bvh=False, depth=8,
                   spp=9, R=R)
        bench_sync("grid4913/bvh", grid_scene(), use_bvh=True, depth=8,
                   spp=9, R=R)
