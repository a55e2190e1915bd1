"""Gradient validation against finite differences (BASELINE.md metric:
pixel-gradient allclose vs finite differences).

With counter-based RNG, the sample stream is independent of scene parameters,
so common-random-numbers central differences converge to the autodiff gradient
for continuous parameters (albedo, emission, fuzz, IOR) without MC-mismatch
noise."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import real_time_ray_tracing_engine_tpu as rt
from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene
from real_time_ray_tracing_engine_tpu.scene.schema import (
    Scene, Sphere, Quad, Lambertian, Metal, DiffuseLight, SolidColor)
from real_time_ray_tracing_engine_tpu.ops.integrator import trace
from real_time_ray_tracing_engine_tpu.utils import rng as rtrng


def _setup():
    light = DiffuseLight(SolidColor((5.0, 5.0, 5.0)))
    floor = Lambertian(SolidColor((0.6, 0.5, 0.4)))
    ball = Lambertian(SolidColor((0.8, 0.2, 0.2)))
    metal = Metal((0.9, 0.9, 0.9), 0.3)
    s = Scene(objects=[
        Quad((-5, 0, -5), (10, 0, 0), (0, 0, 10), floor),
        Quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), light),
        Sphere((0, 1, 0), 1.0, ball),
        Sphere((2.2, 1, 0), 1.0, metal)],
        lights=[Quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), floor)])
    flat = compile_scene(s)
    n = 2048
    org = jnp.broadcast_to(jnp.asarray([0.0, 2.0, 8.0]), (n, 3))
    dr = jnp.broadcast_to(jnp.asarray([0.0, -0.15, -1.0]), (n, 3))
    keys = rtrng.ray_keys(0, jnp.arange(n), jnp.zeros(n, jnp.int32))
    tm = jnp.zeros(n)

    def mean_radiance(flat):
        rad = trace(flat, org, dr, tm, keys, jnp.zeros(3), max_depth=4)
        return jnp.mean(rad)

    return flat, mean_radiance


def _fd_check(flat, f, field, index, h, rtol, min_grad=1e-5):
    arr = getattr(flat, field)

    def loss(v):
        return f(flat.replace(**{field: arr.at[index].set(v)}))

    v0 = arr[index]
    g_ad = jax.grad(loss)(v0)
    g_fd = (loss(v0 + h) - loss(v0 - h)) / (2 * h)
    g_ad, g_fd = float(g_ad), float(g_fd)
    assert abs(g_fd) > min_grad, (field, index, g_fd)
    np.testing.assert_allclose(g_ad, g_fd, rtol=rtol,
                               err_msg=f"{field}[{index}]")


def test_albedo_gradient_matches_fd():
    flat, f = _setup()
    # floor albedo red channel (texture row of the floor material)
    ti = int(np.asarray(flat.mat_tex)[1])  # floor material is row 1
    _fd_check(flat, f, "tex_color", (ti, 0), 1e-3, 5e-3)


def test_emission_gradient_matches_fd():
    flat, f = _setup()
    types = np.asarray(flat.mat_type)
    light_mat = int(np.nonzero(types == 3)[0][0])
    ti = int(np.asarray(flat.mat_tex)[light_mat])
    _fd_check(flat, f, "tex_color", (ti, 1), 1e-3, 5e-3)


def test_fuzz_gradient_finite_nonzero():
    """Fuzz affects radiance mostly through visibility (which surface the
    fuzzy reflection hits) — a genuine discontinuity that the detached
    estimator does not differentiate. The continuous component (shading-point
    motion across the lambertian floor) must still give a finite, nonzero
    autodiff gradient."""
    flat, f0 = _setup()
    # aim the ray bundle at the metal sphere so fuzz participates
    n = 2048
    org = jnp.broadcast_to(jnp.asarray([0.0, 2.0, 8.0]), (n, 3))
    dr = jnp.broadcast_to(jnp.asarray([2.2, -1.0, -8.0]), (n, 3))
    keys = rtrng.ray_keys(0, jnp.arange(n), jnp.zeros(n, jnp.int32))
    tm = jnp.zeros(n)

    def loss(fuzz):
        f = flat.replace(mat_fuzz=fuzz)
        # direction-dependent sky: radiance varies continuously with the
        # fuzzy reflection direction even when every sample misses geometry
        rad = trace(f, org, dr, tm, keys, jnp.zeros(3), max_depth=4,
                    sky_gradient=True)
        return jnp.mean(rad)

    g = jax.grad(loss)(flat.mat_fuzz)
    types = np.asarray(flat.mat_type)
    metal_mat = int(np.nonzero(types == 1)[0][0])
    gm = float(np.asarray(g)[metal_mat])
    assert np.isfinite(np.asarray(g)).all()
    assert abs(gm) > 1e-6, gm


def test_sphere_center_gradient_finite():
    """Geometry gradients (reparameterized t) must be finite; FD agreement is
    approximate because visibility edges are genuinely discontinuous."""
    flat, f = _setup()

    def loss(c):
        return f(flat.replace(sph_center=c))

    g = jax.grad(loss)(flat.sph_center)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_radius_gradient_finite():
    flat, f = _setup()

    def loss(r):
        return f(flat.replace(sph_radius=r))

    g = jax.grad(loss)(flat.sph_radius)
    assert np.isfinite(np.asarray(g)).all()
