import numpy as np
import jax.numpy as jnp

import real_time_ray_tracing_engine_tpu as rt
from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene
from real_time_ray_tracing_engine_tpu.scene.schema import (
    Scene, Sphere, Quad, Lambertian, SolidColor)
from real_time_ray_tracing_engine_tpu.ops.intersect import closest_hit
from real_time_ray_tracing_engine_tpu.ops.bvh import build_bvh, closest_hit_bvh
from real_time_ray_tracing_engine_tpu.utils import rng as rtrng


def _random_scene(n=150, seed=0):
    g = np.random.default_rng(seed)
    mat = Lambertian(SolidColor((0.5, 0.5, 0.5)))
    objs = [Sphere(tuple(g.uniform(-10, 10, 3)), g.uniform(0.2, 1.0), mat)
            for _ in range(n)]
    objs += [Quad(tuple(g.uniform(-10, 10, 3)), tuple(g.uniform(-2, 2, 3)),
                  tuple(g.uniform(-2, 2, 3)), mat) for _ in range(20)]
    return Scene(objects=objs)


def test_bvh_build_structure():
    flat = compile_scene(_random_scene(), use_bvh=True)
    assert flat.use_bvh
    leafs = np.asarray(flat.bvh_leaf)
    counts = np.asarray(flat.bvh_right)[leafs]
    assert counts.max() <= 4  # reference leaf size (BVHNode.hpp:167)
    # every active prim appears exactly once in leaf order
    prims = np.asarray(flat.bvh_prims)
    active = np.concatenate([np.asarray(flat.sph_active),
                             np.asarray(flat.quad_active)])
    expect = np.nonzero(active)[0]
    assert sorted(prims.tolist()) == sorted(expect.tolist())


def test_bvh_matches_brute_force():
    flat = compile_scene(_random_scene(), use_bvh=True)
    g = np.random.default_rng(1)
    n = 256
    org = jnp.asarray(g.uniform(-15, 15, (n, 3)), jnp.float32)
    dr = jnp.asarray(g.normal(size=(n, 3)), jnp.float32)
    tm = jnp.zeros(n)
    a = closest_hit(flat, org, dr, tm)
    b = closest_hit_bvh(flat, org, dr, tm)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hit = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.t)[hit], np.asarray(b.t)[hit],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(a.mat)[hit],
                                  np.asarray(b.mat)[hit])


def test_bvh_image_matches_brute_force():
    """BVH-on and BVH-off renders of the same scene must be identical
    (same RNG stream, same hits) — the reference's -b flag contract."""
    s = rt.builders.textured_spheres()
    s.camera.image_width = 64
    s.camera.max_depth = 4
    img_a = np.asarray(rt.render(s, spp=1, use_bvh=False))
    img_b = np.asarray(rt.render(s, spp=1, use_bvh=True))
    # the two paths compute per-prim t with different float association
    # (component-form (N,P) table vs gathered per-winner scalar form), so a
    # handful of silhouette rays may flip hit/miss discretely — tolerate a
    # small fraction, require everything else tight
    diff = np.abs(img_a - img_b)
    assert (diff > 2e-3).mean() < 0.005, (diff.max(), (diff > 2e-3).mean())
    assert abs(img_a.mean() - img_b.mean()) < 2e-3


def test_bvh_moving_sphere_bbox():
    mat = Lambertian(SolidColor((0.5, 0.5, 0.5)))
    s = Scene(objects=[Sphere((0, 0, -5), 1.0, mat, center2=(0, 5, -5))]
              + [Sphere((8, 0, -5), 1.0, mat) for _ in range(6)])
    flat = compile_scene(s, use_bvh=True)
    org = jnp.asarray([[0.0, 4.9, 0.0]])
    dr = jnp.asarray([[0.0, 0.0, -1.0]])
    rec = closest_hit_bvh(flat, org, dr, jnp.ones(1))  # t=1: moved up
    assert bool(rec.hit[0])
