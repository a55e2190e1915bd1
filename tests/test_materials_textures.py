import numpy as np
import jax.numpy as jnp

from real_time_ray_tracing_engine_tpu.scene import compile as scomp
from real_time_ray_tracing_engine_tpu.scene.schema import (
    Scene, Sphere, Lambertian, Metal, Dielectric, DiffuseLight, Isotropic,
    SolidColor, Checker, Noise)
from real_time_ray_tracing_engine_tpu.ops import materials as mops
from real_time_ray_tracing_engine_tpu.ops.textures import texture_value
from real_time_ray_tracing_engine_tpu.utils.vecmath import dot, normalize


def _scene_with_materials():
    mats = [Lambertian(SolidColor((0.5, 0.4, 0.3))),
            Metal((0.9, 0.9, 0.9), 0.0),
            Dielectric(1.5),
            DiffuseLight(SolidColor((4.0, 4.0, 4.0))),
            Isotropic(SolidColor((1.0, 1.0, 1.0)))]
    objs = [Sphere((i * 3.0, 0, -3), 1.0, m) for i, m in enumerate(mats)]
    return scomp.compile_scene(Scene(objects=objs))


def test_emitted_front_face_only():
    flat = _scene_with_materials()
    mat = jnp.asarray([3, 3], jnp.int32)  # diffuse light rows
    p = jnp.zeros((2, 3))
    e = mops.emitted(flat, mat, jnp.zeros(2), jnp.zeros(2), p,
                     jnp.asarray([True, False]))
    np.testing.assert_allclose(np.asarray(e[0]), [4, 4, 4])
    np.testing.assert_allclose(np.asarray(e[1]), [0, 0, 0])


def test_metal_mirror_reflection():
    flat = _scene_with_materials()
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 2)
    in_dir = normalize(jnp.asarray([[1.0, -1.0, 0.0]] * 2))
    sc = mops.scatter(flat, jnp.asarray([1, 1], jnp.int32), in_dir, n,
                      jnp.ones(2, bool), jnp.zeros(2), jnp.zeros(2),
                      jnp.zeros((2, 3)), jnp.asarray([0.3, 0.7]),
                      jnp.asarray([0.2, 0.9]), jnp.zeros(2))
    assert bool(sc.skip_pdf.all()) and bool(sc.scatters.all())
    # fuzz=0 -> exact mirror regardless of uniforms
    expect = normalize(jnp.asarray([[1.0, 1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(sc.skip_dir[0]),
                               np.asarray(expect[0]), atol=1e-6)


def test_metal_absorbs_below_surface():
    # huge fuzz can push the scattered ray below the surface -> absorbed
    mats = [Metal((1, 1, 1), 5.0)]
    flat = scomp.compile_scene(
        Scene(objects=[Sphere((0, 0, -3), 1.0, m) for m in mats]))
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 64)
    in_dir = normalize(jnp.broadcast_to(jnp.asarray([1.0, -0.05, 0.0]),
                                        (64, 3)))
    u = np.random.default_rng(0).uniform(size=(3, 64)).astype(np.float32)
    sc = mops.scatter(flat, jnp.zeros(64, jnp.int32), in_dir, n,
                      jnp.ones(64, bool), jnp.zeros(64), jnp.zeros(64),
                      jnp.zeros((64, 3)), jnp.asarray(u[0]), jnp.asarray(u[1]),
                      jnp.asarray(u[2]))
    # with grazing incidence + fuzz 5, many samples go below the surface
    assert 0 < int(sc.scatters.sum()) < 64


def test_dielectric_tir_and_refraction():
    flat = _scene_with_materials()
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 2)
    # ray 0: shallow grazing from inside glass (back face, ri=1.5) -> TIR
    # ray 1: normal incidence from outside -> refracts straight through
    in_dir = normalize(jnp.asarray([[1.0, -0.1, 0.0], [0.0, -1.0, 0.0]]))
    sc = mops.scatter(flat, jnp.asarray([2, 2], jnp.int32), in_dir, n,
                      jnp.asarray([False, True]),  # back face, front face
                      jnp.zeros(2), jnp.zeros(2), jnp.zeros((2, 3)),
                      jnp.zeros(2), jnp.zeros(2),
                      jnp.asarray([0.999, 0.999]))  # refl draw ~1: no Schlick
    d = np.asarray(sc.skip_dir)
    assert d[0][1] > 0  # TIR: reflected upward
    np.testing.assert_allclose(d[1], [0, -1, 0], atol=1e-5)  # straight through
    np.testing.assert_allclose(np.asarray(sc.attenuation), 1.0)


def test_scattering_pdf_cosine_and_isotropic():
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 2)
    out = normalize(jnp.asarray([[0.0, 1.0, 0.0], [1.0, 1.0, 0.0]]))
    pdf = mops.scattering_pdf(n, jnp.asarray([False, False]), out)
    np.testing.assert_allclose(np.asarray(pdf),
                               [1 / np.pi, np.cos(np.pi / 4) / np.pi],
                               rtol=1e-5)
    pdf_iso = mops.scattering_pdf(n, jnp.asarray([True, True]), out)
    np.testing.assert_allclose(np.asarray(pdf_iso), 1 / (4 * np.pi))


def test_material_sampler_matches_pdf():
    """Monte-Carlo check: E[f(w)/p(w)] over sampled dirs == integral f."""
    from real_time_ray_tracing_engine_tpu.utils import rng as rtrng
    keys = rtrng.ray_keys(1, jnp.arange(8192), jnp.zeros(8192, jnp.int32))
    u = rtrng.uniforms(keys, 3, (2,))
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (8192, 3))
    d = mops.material_pdf_sample(n, jnp.zeros(8192, bool), u[:, 0], u[:, 1])
    p = mops.material_pdf_value(n, jnp.zeros(8192, bool), d)
    # estimate integral of cos(theta) over hemisphere = pi
    est = float(jnp.mean(jnp.maximum(dot(d, n), 0.0) / p))
    np.testing.assert_allclose(est, np.pi, rtol=0.02)


def test_texture_solid_checker_noise():
    checker = Checker(1.0, SolidColor((1, 0, 0)), SolidColor((0, 1, 0)))
    sc = Scene(objects=[
        Sphere((0, 0, 0), 1.0, Lambertian(SolidColor((0.2, 0.4, 0.6)))),
        Sphere((0, 0, 0), 1.0, Lambertian(checker)),
        Sphere((0, 0, 0), 1.0, Lambertian(Noise(2.0)))])
    flat = scomp.compile_scene(sc)
    # texture rows: 0 solid, 1,2 checker children, 3 checker, 4 noise
    p = jnp.asarray([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]])
    t_solid = texture_value(flat, jnp.asarray([0, 0]), jnp.zeros(2),
                            jnp.zeros(2), p)
    np.testing.assert_allclose(np.asarray(t_solid),
                               [[0.2, 0.4, 0.6]] * 2, rtol=1e-6)
    ch_idx = int(np.nonzero(np.asarray(flat.tex_type) == 1)[0][0])
    t_ch = texture_value(flat, jnp.full(2, ch_idx, jnp.int32), jnp.zeros(2),
                         jnp.zeros(2), p)
    # (0,0,0) parity even -> red; shifting x by 1 flips parity -> green
    np.testing.assert_allclose(np.asarray(t_ch), [[1, 0, 0], [0, 1, 0]],
                               atol=1e-6)
    nz_idx = int(np.nonzero(np.asarray(flat.tex_type) == 2)[0][0])
    pts = jnp.asarray(np.random.default_rng(0).uniform(-10, 10, (256, 3)),
                      jnp.float32)
    t_nz = texture_value(flat, jnp.full(256, nz_idx, jnp.int32),
                         jnp.zeros(256), jnp.zeros(256), pts)
    a = np.asarray(t_nz)
    assert a.min() >= 0.0 and a.max() <= 1.0 and a.std() > 0.05
