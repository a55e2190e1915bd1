"""Dev harness for the adjoint backward: small vscan scene, interpret mode,
compare render_pass_pallas(adjoint=True) grads vs jax.vjp of the pure-JAX
replay of the identical estimator.

CAVEAT (kept for the audit trail): the replay comparison can legitimately
"fail" at kernel-vs-oracle grazing-hit winner disagreements (the vscan
selection fuzz) — kernel-FD confirms the adjoint is exact for the
kernel's own estimator at such lanes. The authoritative validations live
in tests/test_grad.py (adjoint vs the FD-anchored tangent/suffix kernels
over the SAME selection)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import real_time_ray_tracing_engine_tpu as rt
import real_time_ray_tracing_engine_tpu.ops.wavefront_pallas as wp
from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene
from real_time_ray_tracing_engine_tpu.models import camera as cam_mod
from real_time_ray_tracing_engine_tpu.parallel import train
from real_time_ray_tracing_engine_tpu.parallel.mesh import \
    _tile_sample_render


def build_scene(kind="vscan"):
    rng = np.random.default_rng(21)
    if kind == "cornell":
        s = rt.builders.cornell_box()
        s.camera.image_width = 16
        s.camera.samples_per_pixel = 4
        s.camera.max_depth = 4
        return s
    objs = []
    for i in range(78):
        c = tuple(map(float, rng.uniform(-4, 4, 3)))
        albedo = tuple(map(float, rng.uniform(0.25, 0.9, 3)))
        m = (rt.Metal(albedo, fuzz=0.25) if i % 9 == 0 else
             rt.Dielectric(1.5) if i == 4 else
             rt.Lambertian(rt.SolidColor(albedo)))
        objs.append(rt.Sphere(c, 0.5, m))
    light = rt.Sphere((0, 8, 0), 2.0,
                      rt.DiffuseLight(rt.SolidColor((6., 6., 6.))))
    objs.append(light)
    return rt.Scene(objects=objs, lights=[light],
                    camera=rt.CameraConfig(
                        image_width=16, aspect_ratio=1.0,
                        samples_per_pixel=4, max_depth=4, vfov=45,
                        lookfrom=(0, 2, 11), lookat=(0, 0, 0),
                        background=(0.3, 0.4, 0.6)))


def main(kind):
    scene = build_scene(kind)
    flat = compile_scene(scene)
    assert wp.pallas_adjoint_gate_reason(flat) is None
    camst = cam_mod.derive(scene.camera)
    w, h = cam_mod.image_size(scene.camera)
    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.normal(size=(h, w, 3)), jnp.float32)
    seed = jnp.asarray(0, jnp.uint32)
    kw = dict(width=w, height=h, n_strata=2, max_depth=4, n_samples=4,
              interpret=True)

    img, grads = wp.render_pass_pallas(
        flat, camst, seed, 0, cotangent=g, adjoint=True,
        light_src=wp.light_sphere_sources(flat), **kw)
    img = np.asarray(img)
    print("img mean", img.mean(), "finite", np.isfinite(img).all())

    # forward oracle image (same estimator)
    img0 = np.asarray(wp.render_pass_pallas(flat, camst, seed, 0, **kw))
    print("img vs forward max abs diff:", np.abs(img - img0).max())

    params = train.get_params(flat)

    def replay(p):
        return _tile_sample_render(
            train.set_params(flat, p), camst, seed, width=w,
            height_local=h, row0=jnp.asarray(0, jnp.int32), n_strata=2,
            spp_local=4, sample0=jnp.asarray(0, jnp.int32), max_depth=4,
            sky_gradient=False)

    _, vjp = jax.jit(lambda p: jax.vjp(replay, p)[1](g))(params), None
    (want,) = jax.jit(lambda p: jax.vjp(replay, p)[1](g))(params)

    ok = True
    for f in ("tex_color", "sph_center", "sph_radius", "mat_fuzz",
              "mat_ior"):
        got = np.asarray(grads[f])
        ref = np.asarray(want[f])
        scale = max(np.abs(ref).max(), 1e-6)
        d = np.abs(got - ref).max()
        match = np.allclose(got, ref, rtol=2e-2, atol=2e-3 * scale)
        ok &= match
        print(f"{f:12s} maxref {np.abs(ref).max():10.4g} "
              f"maxdiff {d:10.4g}  match={match}")
    print("OK" if ok else "FAIL")
    return ok


if __name__ == "__main__":
    import sys
    kind = sys.argv[1] if len(sys.argv) > 1 else "vscan"
    ok = main(kind)
    sys.exit(0 if ok else 1)
