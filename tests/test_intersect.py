import numpy as np
import jax.numpy as jnp

from real_time_ray_tracing_engine_tpu.scene import builders, compile as scomp
from real_time_ray_tracing_engine_tpu.scene.schema import (
    Scene, Sphere, Quad, Box, Translate, RotateY, Lambertian, SolidColor,
    CameraConfig)
from real_time_ray_tracing_engine_tpu.ops.intersect import closest_hit
from real_time_ray_tracing_engine_tpu.utils.vecmath import BIG


def _lam():
    return Lambertian(SolidColor((0.5, 0.5, 0.5)))


def _hit(flat, org, dr, tm=None):
    org = jnp.asarray(org, jnp.float32).reshape(-1, 3)
    dr = jnp.asarray(dr, jnp.float32).reshape(-1, 3)
    tm = jnp.zeros(org.shape[0]) if tm is None else jnp.asarray(tm)
    return closest_hit(flat, org, dr, tm)


def test_sphere_hit_frontface():
    s = Scene(objects=[Sphere((0, 0, -3), 1.0, _lam())])
    flat = scomp.compile_scene(s)
    rec = _hit(flat, [0, 0, 0], [0, 0, -1])
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0, 0, 1], atol=1e-5)
    assert bool(rec.front_face[0])


def test_sphere_inside_hit_backface():
    s = Scene(objects=[Sphere((0, 0, 0), 2.0, _lam())])
    flat = scomp.compile_scene(s)
    rec = _hit(flat, [0, 0, 0], [0, 0, -1])
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-5)
    assert not bool(rec.front_face[0])


def test_moving_sphere():
    s = Scene(objects=[Sphere((0, 0, -3), 1.0, _lam(), center2=(0, 2, -3))])
    flat = scomp.compile_scene(s)
    rec0 = _hit(flat, [0, 0, 0], [0, 0, -1], tm=[0.0])
    rec1 = _hit(flat, [0, 0, 0], [0, 0, -1], tm=[1.0])
    assert bool(rec0.hit[0]) and not bool(rec1.hit[0])
    rec2 = _hit(flat, [0, 2, 0], [0, 0, -1], tm=[1.0])
    assert bool(rec2.hit[0])


def test_quad_hit_and_uv():
    s = Scene(objects=[Quad((-1, -1, -2), (2, 0, 0), (0, 2, 0), _lam())])
    flat = scomp.compile_scene(s)
    rec = _hit(flat, [0.5, 0.5, 0], [0, 0, -1])
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(rec.u[0]), 0.75, atol=1e-5)
    np.testing.assert_allclose(float(rec.v[0]), 0.75, atol=1e-5)
    # outside the parallelogram
    rec2 = _hit(flat, [2.5, 0, 0], [0, 0, -1])
    assert not bool(rec2.hit[0])


def test_closest_of_many():
    s = Scene(objects=[Sphere((0, 0, -5), 1.0, _lam()),
                       Sphere((0, 0, -10), 1.0, _lam()),
                       Quad((-1, -1, -3), (2, 0, 0), (0, 2, 0), _lam())])
    flat = scomp.compile_scene(s)
    rec = _hit(flat, [0, 0, 0], [0, 0, -1])
    np.testing.assert_allclose(float(rec.t[0]), 3.0, rtol=1e-5)


def test_translate_rotate_baking():
    # box rotated 90deg about Y then translated: a unit box at origin rotated
    # 90 still occupies the same region; translate moves it
    box = Box((-1, -1, -1), (1, 1, 1), _lam())
    s = Scene(objects=[Translate(RotateY(box, 90.0), (10, 0, 0))])
    flat = scomp.compile_scene(s)
    rec = _hit(flat, [10, 0, 5], [0, 0, -1])
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 4.0, rtol=1e-4)
    rec2 = _hit(flat, [0, 0, 5], [0, 0, -1])
    assert not bool(rec2.hit[0])


def test_rotate_y_angle():
    # quad in xy-plane rotated 90 about Y becomes a quad in the yz-plane
    q = Quad((-1, -1, 0), (2, 0, 0), (0, 2, 0), _lam())
    s = Scene(objects=[RotateY(q, 90.0)])
    flat = scomp.compile_scene(s)
    rec = _hit(flat, [5, 0, 0], [-1, 0, 0])
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 5.0, rtol=1e-4)


def test_miss_returns_big():
    s = Scene(objects=[Sphere((0, 0, -3), 1.0, _lam())])
    flat = scomp.compile_scene(s)
    rec = _hit(flat, [0, 0, 0], [0, 1, 0])
    assert not bool(rec.hit[0])
    assert float(rec.t[0]) >= BIG * 0.5
