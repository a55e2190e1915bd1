import numpy as np
import jax.numpy as jnp

import real_time_ray_tracing_engine_tpu as rt
from real_time_ray_tracing_engine_tpu.scene.schema import (
    Scene, Sphere, Quad, Box, Lambertian, DiffuseLight, SolidColor,
    ConstantMedium, CameraConfig)
from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene
from real_time_ray_tracing_engine_tpu.ops.integrator import trace
from real_time_ray_tracing_engine_tpu.utils import rng as rtrng


def _trace_n(flat, org, dr, n, seed=0, depth=16, bg=(0, 0, 0), sky=False):
    org = jnp.broadcast_to(jnp.asarray(org, jnp.float32), (n, 3))
    dr = jnp.broadcast_to(jnp.asarray(dr, jnp.float32), (n, 3))
    keys = rtrng.ray_keys(seed, jnp.arange(n), jnp.zeros(n, jnp.int32))
    return trace(flat, org, dr, jnp.zeros(n), keys,
                 jnp.asarray(bg, jnp.float32), max_depth=depth,
                 sky_gradient=sky)


def test_miss_returns_background():
    flat = compile_scene(Scene(objects=[
        Sphere((0, 0, -5), 1.0, Lambertian(SolidColor((0.5, 0.5, 0.5))))]))
    rad = _trace_n(flat, (0, 0, 0), (0, 1, 0), 8, bg=(0.25, 0.5, 0.75))
    np.testing.assert_allclose(np.asarray(rad),
                               np.tile([0.25, 0.5, 0.75], (8, 1)), rtol=1e-6)


def test_direct_emitter_view():
    flat = compile_scene(Scene(objects=[
        Quad((-1, -1, -2), (2, 0, 0), (0, 2, 0),
             DiffuseLight(SolidColor((3, 2, 1))))]))
    rad = _trace_n(flat, (0, 0, 0), (0, 0, -1), 4)
    np.testing.assert_allclose(np.asarray(rad), np.tile([3, 2, 1], (4, 1)),
                               rtol=1e-5)


def test_furnace_energy_conservation():
    """White lambertian sphere in a uniform white environment must be
    indistinguishable from the environment (albedo 1 furnace test)."""
    flat = compile_scene(Scene(objects=[
        Sphere((0, 0, -3), 1.0, Lambertian(SolidColor((1.0, 1.0, 1.0))))]))
    rad = _trace_n(flat, (0, 0, 0), (0, 0, -1), 4096, depth=50,
                   bg=(1.0, 1.0, 1.0))
    m = np.asarray(rad).mean(axis=0)
    np.testing.assert_allclose(m, 1.0, rtol=0.02)


def test_furnace_albedo_half():
    """Gray furnace: radiance = sum_k P(escape after k bounces) a^k < 1,
    monotone in albedo; sanity-bound the estimate."""
    flat = compile_scene(Scene(objects=[
        Sphere((0, 0, -3), 1.0, Lambertian(SolidColor((0.5, 0.5, 0.5))))]))
    rad = _trace_n(flat, (0, 0, 0), (0, 0, -1), 4096, depth=50,
                   bg=(1.0, 1.0, 1.0))
    m = float(np.asarray(rad).mean())
    assert 0.3 < m < 0.75  # between a and 1 for a convex body


def test_mis_unbiased_vs_bsdf_sampling():
    """The MIS estimator (lights list present) and the pure-BSDF estimator
    (no lights) must agree in expectation (Camera.cpp:269-273 semantics)."""
    light = DiffuseLight(SolidColor((10, 10, 10)))
    floor = Lambertian(SolidColor((0.7, 0.7, 0.7)))
    objs = [Quad((-5, 0, -5), (10, 0, 0), (0, 0, 10), floor),
            Quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), light)]
    s_mis = Scene(objects=objs,
                  lights=[Quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), floor)])
    s_bsdf = Scene(objects=objs, lights=[])
    n = 16384
    r_mis = np.asarray(_trace_n(compile_scene(s_mis), (0, 2, 6),
                                (0, -0.25, -1), n, depth=8)).mean()
    r_bsdf = np.asarray(_trace_n(compile_scene(s_bsdf), (0, 2, 6),
                                 (0, -0.25, -1), n, depth=8, seed=1)).mean()
    assert abs(r_mis - r_bsdf) / max(r_bsdf, 1e-6) < 0.08, (r_mis, r_bsdf)


def test_mis_variance_reduction():
    """With a small bright light, MIS should have much lower variance than
    BSDF-only sampling at equal sample count."""
    light = DiffuseLight(SolidColor((100, 100, 100)))
    floor = Lambertian(SolidColor((0.7, 0.7, 0.7)))
    objs = [Quad((-5, 0, -5), (10, 0, 0), (0, 0, 10), floor),
            Quad((-0.3, 4, -0.3), (0.6, 0, 0), (0, 0, 0.6), light)]
    s_mis = Scene(objects=objs, lights=[Quad((-0.3, 4, -0.3), (0.6, 0, 0),
                                             (0, 0, 0.6), floor)])
    s_bsdf = Scene(objects=objs)
    n = 8192
    r_mis = np.asarray(_trace_n(compile_scene(s_mis), (0, 2, 6),
                                (0, -0.25, -1), n, depth=4))
    r_bsdf = np.asarray(_trace_n(compile_scene(s_bsdf), (0, 2, 6),
                                 (0, -0.25, -1), n, depth=4))
    assert r_mis.std() < r_bsdf.std() * 0.7


def test_constant_medium_attenuates_background():
    """A absorbing-ish black fog box in front of a bright background dims
    rays according to exponential transmission."""
    fog = ConstantMedium(Box((-2, -2, -4), (2, 2, -2), Lambertian(
        SolidColor((1, 1, 1)))), 1.0, SolidColor((0.0, 0.0, 0.0)))
    flat = compile_scene(Scene(objects=[fog]))
    assert flat.n_mediums == 1
    rad = np.asarray(_trace_n(flat, (0, 0, 0), (0, 0, -1), 8192, depth=8,
                              bg=(1.0, 1.0, 1.0)))
    # transmission through 2 units of density-1 black fog: exp(-2) ~ 0.135
    np.testing.assert_allclose(rad.mean(), np.exp(-2.0), rtol=0.1)


def test_constant_medium_white_fog_scatters_not_absorbs():
    fog = ConstantMedium(Box((-2, -2, -4), (2, 2, -2), Lambertian(
        SolidColor((1, 1, 1)))), 2.0, SolidColor((1.0, 1.0, 1.0)))
    flat = compile_scene(Scene(objects=[fog]))
    rad = np.asarray(_trace_n(flat, (0, 0, 0), (0, 0, -1), 8192, depth=64,
                              bg=(1.0, 1.0, 1.0)))
    # white isotropic fog in a white furnace conserves energy
    np.testing.assert_allclose(rad.mean(), 1.0, rtol=0.03)


def test_depth_zero_semantics():
    flat = compile_scene(Scene(objects=[
        Sphere((0, 0, -3), 1.0, Lambertian(SolidColor((1, 1, 1))))]))
    rad = _trace_n(flat, (0, 0, 0), (0, 0, -1), 4, depth=0, bg=(1, 1, 1))
    np.testing.assert_allclose(np.asarray(rad), 0.0)


def test_sky_gradient_background():
    flat = compile_scene(Scene(objects=[
        Sphere((0, 0, -100), 1.0, Lambertian(SolidColor((1, 1, 1))))]))
    up = np.asarray(_trace_n(flat, (0, 0, 0), (0, 1, 0), 2, sky=True))
    down = np.asarray(_trace_n(flat, (0, 0, 0), (0, -1, 0), 2, sky=True))
    np.testing.assert_allclose(up[0], [0.5, 0.7, 1.0], rtol=1e-5)
    np.testing.assert_allclose(down[0], [1.0, 1.0, 1.0], rtol=1e-5)
