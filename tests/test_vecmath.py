import numpy as np
import jax.numpy as jnp

from real_time_ray_tracing_engine_tpu.utils import vecmath as vm
from real_time_ray_tracing_engine_tpu.utils import rng as rtrng
import jax


def test_dot_cross_normalize(rng):
    a = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    np.testing.assert_allclose(vm.dot(a, b), np.sum(np.asarray(a) * np.asarray(b), -1),
                               rtol=1e-5)
    n = vm.normalize(a)
    np.testing.assert_allclose(vm.length(n), 1.0, rtol=1e-5)
    # cross orthogonal to both
    c = vm.cross(a, b)
    np.testing.assert_allclose(vm.dot(c, a), 0.0, atol=1e-4)


def test_reflect_preserves_length_and_flips(rng):
    v = jnp.asarray([[1.0, -1.0, 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    r = vm.reflect(v, n)
    np.testing.assert_allclose(np.asarray(r), [[1.0, 1.0, 0.0]], atol=1e-6)


def test_refract_snell(rng):
    # normal incidence: straight through
    uv = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    r = vm.refract(uv, n, jnp.asarray([1.5]))
    np.testing.assert_allclose(np.asarray(r), [[0.0, -1.0, 0.0]], atol=1e-6)
    # oblique: sin(theta_t) = eta * sin(theta_i)
    uv = vm.normalize(jnp.asarray([[1.0, -1.0, 0.0]], jnp.float32))
    eta = 0.5
    r = vm.refract(uv, n, jnp.asarray([eta]))
    sin_i = np.sqrt(0.5)
    sin_t = np.abs(np.asarray(r)[0, 0]) / np.linalg.norm(np.asarray(r))
    np.testing.assert_allclose(sin_t, eta * sin_i, rtol=1e-5)


def test_onb_orthonormal(rng):
    w = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    u, v, wn = vm.onb_from_w(w)
    for x in (u, v, wn):
        np.testing.assert_allclose(vm.length(x), 1.0, rtol=1e-5)
    np.testing.assert_allclose(vm.dot(u, v), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(u, wn), 0.0, atol=1e-5)


def test_samplers_statistics():
    keys = rtrng.ray_keys(0, jnp.arange(4096), jnp.zeros(4096, jnp.int32))
    u = rtrng.uniforms(keys, 7, (2,))
    assert 0.48 < float(u.mean()) < 0.52
    vecs = rtrng.unit_vector_from_uv(u[:, 0], u[:, 1])
    np.testing.assert_allclose(vm.length(vecs), 1.0, rtol=1e-5)
    assert abs(float(vecs.mean())) < 0.03  # uniform on sphere -> mean 0

    cosd = rtrng.cosine_direction_from_uv(u[:, 0], u[:, 1])
    # E[cos theta] for cosine-weighted = 2/3
    assert abs(float(cosd[:, 2].mean()) - 2.0 / 3.0) < 0.02


def test_rng_determinism_and_decorrelation():
    k1 = rtrng.ray_keys(0, jnp.arange(8), jnp.zeros(8, jnp.int32))
    k2 = rtrng.ray_keys(0, jnp.arange(8), jnp.zeros(8, jnp.int32))
    u1 = rtrng.bounce_uniforms(k1, 0)
    u2 = rtrng.bounce_uniforms(k2, 0)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    u3 = rtrng.bounce_uniforms(k1, 1)
    assert not np.allclose(np.asarray(u1), np.asarray(u3))
