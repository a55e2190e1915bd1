"""Adjoint-backward benchmarks (round 5): full-family fwd+bwd throughput.

Scalar-fetch chained timing per BASELINE.md measurement discipline:
device-chain reps in one jitted lax.scan, fetch ONE scalar.

Usage: python scripts/bench_adjoint.py [scene] [W] [H] [spp] [depth] [fields]
  scene: bouncing | cornell | grid
  fields: comma list or "all"
Env: RTX_ADJOINT=0 measures the pre-adjoint tier stack instead.
"""
import math
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import real_time_ray_tracing_engine_tpu as rt
    from real_time_ray_tracing_engine_tpu.models import camera as cam_mod
    from real_time_ray_tracing_engine_tpu.parallel import train
    from real_time_ray_tracing_engine_tpu.parallel.mesh import \
        make_render_mesh
    from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene

    name = sys.argv[1] if len(sys.argv) > 1 else "bouncing"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 225
    spp = int(sys.argv[4]) if len(sys.argv) > 4 else 9
    depth = int(sys.argv[5]) if len(sys.argv) > 5 else 50
    fieldspec = sys.argv[6] if len(sys.argv) > 6 else "all"

    if name == "bouncing":
        scene = rt.builders.bouncing_spheres()
    elif name == "cornell":
        scene = rt.builders.cornell_box()
    else:
        rng = np.random.default_rng(0)
        objs = []
        for x in range(17):
            for y in range(17):
                for z in range(17):
                    c = (x * 1.2 - 9.6, y * 1.2 - 9.6, z * 1.2 - 30)
                    a = tuple(map(float, rng.uniform(0.3, 0.9, 3)))
                    objs.append(rt.Sphere(c, 0.35,
                                          rt.Lambertian(rt.SolidColor(a))))
        scene = rt.Scene(objects=objs, camera=rt.CameraConfig(
            image_width=W, aspect_ratio=W / H, samples_per_pixel=spp,
            max_depth=depth, vfov=40, lookfrom=(0, 0, 5),
            lookat=(0, 0, -30), background=(0.5, 0.6, 0.8)))
    scene.camera.image_width = W
    scene.camera.aspect_ratio = W / H
    n_strata = int(math.isqrt(spp))
    spp = n_strata * n_strata
    flat = compile_scene(scene)
    cam = cam_mod.derive(scene.camera)
    mesh = make_render_mesh(1, 1, devices=jax.devices()[:1])
    render = train.make_kernel_render(
        flat, mesh=mesh, width=W, height=H, n_strata=n_strata,
        max_depth=depth)
    target = jnp.zeros((H, W, 3), jnp.float32)
    fields = (train.TRAINABLE_FIELDS if fieldspec == "all"
              else tuple(fieldspec.split(",")))
    params = {k: v for k, v in train.get_params(flat).items()
              if k in fields}
    print(f"[bench] {name} {W}x{H} spp{spp} d{depth} fields={fields} "
          f"RTX_ADJOINT={os.environ.get('RTX_ADJOINT', '1')}", flush=True)
    from real_time_ray_tracing_engine_tpu.ops.wavefront_pallas import \
        hard_param_slots
    print(f"[bench] hard slots: "
          f"{len(hard_param_slots(flat, set(fields) - {'tex_color'}))}",
          flush=True)

    @jax.jit
    def loss_grad(params, seed_f):
        def loss(p):
            img = render(p, cam, seed_f)
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss)(params)

    t0 = time.time()
    l, g = loss_grad(params, jnp.asarray(0.0))
    l = float(np.asarray(l))
    print(f"[bench] compile+first step {time.time() - t0:.1f}s loss={l:.5f}",
          flush=True)
    for k in params:
        assert np.isfinite(np.asarray(g[k])).all(), k

    reps = 3

    @jax.jit
    def chain(params):
        def body(acc, i):
            l, g = loss_grad(params, i.astype(jnp.float32) + 1.0)
            s = l
            for k in g:
                s = s + g[k].sum()
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc

    np.asarray(chain(params))
    dt = math.inf
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(chain(params))
        dt = min(dt, (time.perf_counter() - t0) / reps)
    mp = W * H * spp / dt / 1e6
    print(f"[bench] fwd+bwd {dt * 1e3:.1f} ms/step = {mp:.2f} Mpaths/s",
          flush=True)


if __name__ == "__main__":
    main()
