"""Fused Pallas wavefront megakernel vs the pure-JAX integrator oracle.

Mirrors the reference's CPU-renderer-as-oracle-for-the-CUDA-path validation
(StaticCamera.cpp:169-178 fallback chain; SURVEY.md §4): the kernel
reimplements the same estimator with the same PCG4D draw streams per
(pixel, sample, bounce), so per-pixel radiance must match the JAX path up to
float-associativity noise plus a small fraction of discrete branch flips
(t-comparison ties, Schlick threshold crossings) on last-ulp differences.

Runs in Pallas interpret mode on the CPU test backend.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from real_time_ray_tracing_engine_tpu.models.render import (_render_pass,
                                                            pick_engine)
from real_time_ray_tracing_engine_tpu.models import camera as cam_mod
from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene
from real_time_ray_tracing_engine_tpu.scene import builders
from real_time_ray_tracing_engine_tpu.ops.wavefront_pallas import (
    render_pass_pallas, supports_pallas)
import real_time_ray_tracing_engine_tpu as rt


def _compare(scene, *, n_samples=2, max_depth=4, n_strata=2, seed=0,
             use_bvh=False):
    flat = compile_scene(scene, use_bvh=use_bvh)
    cam = cam_mod.derive(scene.camera)
    w, h = cam_mod.image_size(scene.camera)
    kw = dict(width=w, height=h, n_strata=n_strata, max_depth=max_depth,
              n_samples=n_samples, sky_gradient=scene.camera.sky_gradient)
    img_p = np.asarray(render_pass_pallas(
        flat, cam, jnp.uint32(seed), jnp.int32(0), rows_per_tile=8,
        interpret=True, **kw))
    img_j = np.asarray(_render_pass(
        flat, cam, jnp.asarray(seed, jnp.uint32), jnp.asarray(0, jnp.int32),
        tile_rows=min(h, 32), **kw))
    return img_p, img_j


def _assert_close(img_p, img_j, frac_tol=0.01):
    assert np.isfinite(img_p).all()
    diff = np.abs(img_p - img_j)
    # identical draw streams: all but discrete branch-flip pixels match
    assert (diff > 1e-3).mean() < frac_tol, (diff.max(), (diff > 1e-3).mean())
    assert abs(img_p.mean() - img_j.mean()) < 2e-3


def test_cornell_box_matches_jax_oracle():
    scene = builders.cornell_box()
    scene.camera.image_width = 48
    img_p, img_j = _compare(scene)
    _assert_close(img_p, img_j)


def test_noise_scene_matches_oracle():
    """textured_spheres (Perlin marble, BASELINE config 3) in-kernel: the
    hash-noise redesign (utils/perlin.py) evaluates the same arithmetic in
    the kernel and the traced-JAX oracle, so the images must agree."""
    scene = builders.textured_spheres()
    scene.camera.image_width = 48
    flat = compile_scene(scene)
    assert supports_pallas(flat) and flat.has_noise
    img_p, img_j = _compare(scene)
    _assert_close(img_p, img_j)


def test_materials_scene_matches_oracle():
    """Sphere scene exercising lambertian/metal/dielectric + checker +
    sphere light + DOF + motion blur in one image."""
    cam = rt.CameraConfig(aspect_ratio=16 / 9, image_width=64,
                          samples_per_pixel=4, max_depth=4, vfov=20,
                          lookfrom=(13, 2, 3), lookat=(0, 0, 0),
                          defocus_angle=0.6, focus_dist=10.0,
                          background=(0.7, 0.8, 1.0))
    checker = rt.Checker(2.0, rt.SolidColor((0.2, 0.3, 0.1)),
                         rt.SolidColor((0.9, 0.9, 0.9)))
    light_sphere = rt.Sphere((0, 6, 0), 2.0,
                             rt.DiffuseLight(rt.SolidColor((4, 4, 4))))
    scene = rt.Scene(
        objects=[
            rt.Sphere((0, -1000, 0), 1000.0, rt.Lambertian(checker)),
            rt.Sphere((0, 1, 0), 1.0, rt.Dielectric(1.5)),
            rt.Sphere((-4, 1, 0), 1.0,
                      rt.Lambertian(rt.SolidColor((0.4, 0.2, 0.1))),
                      center2=(-4, 1.3, 0)),
            rt.Sphere((4, 1, 0), 1.0, rt.Metal((0.7, 0.6, 0.5), fuzz=0.1)),
            light_sphere,
        ],
        lights=[light_sphere],
        camera=cam)
    img_p, img_j = _compare(scene)
    _assert_close(img_p, img_j)


def test_scan_mode_matches_oracle():
    """>64 prims / >16 materials selects the fori_loop prim-scan kernel
    (dynamic SMEM reads + material row riding the intersection carry)."""
    from real_time_ray_tracing_engine_tpu.ops.wavefront_pallas import \
        _use_unrolled
    rng = np.random.default_rng(1)
    objs = []
    for i in range(70):
        c = tuple(map(float, rng.uniform(-4, 4, 3)))
        albedo = tuple(map(float, rng.uniform(0.2, 0.9, 3)))
        m = (rt.Lambertian(rt.SolidColor(albedo)) if i % 3
             else rt.Metal(albedo, fuzz=0.2))
        objs.append(rt.Sphere(c, 0.4, m))
    objs.append(rt.Sphere(
        (0, -1000, 0), 996.0,
        rt.Lambertian(rt.Checker(2.0, rt.SolidColor((0.1, 0.1, 0.1)),
                                 rt.SolidColor((0.9, 0.9, 0.9))))))
    light = rt.Sphere((0, 8, 0), 2.0,
                      rt.DiffuseLight(rt.SolidColor((5, 5, 5))))
    objs.append(light)
    scene = rt.Scene(objects=objs, lights=[light],
                     camera=rt.CameraConfig(
                         image_width=48, aspect_ratio=1.0,
                         samples_per_pixel=4, max_depth=4, vfov=40,
                         lookfrom=(0, 2, 10), lookat=(0, 0, 0),
                         background=(0.5, 0.6, 0.8)))
    flat = compile_scene(scene)
    assert not _use_unrolled(flat.sph_center.shape[0],
                             flat.quad_corner.shape[0],
                             flat.mat_type.shape[0], flat.tex_type.shape[0])
    assert supports_pallas(flat)
    img_p, img_j = _compare(scene)
    _assert_close(img_p, img_j)


def test_bvh_mode_matches_oracle(monkeypatch):
    """Shared-stack flat-BVH kernel traversal (RTX_BVH_STACK=1 on a
    use_bvh non-unrolled scene; also auto-selected for quad-heavy BVH
    scenes, _kernel_modes) vs the pure-JAX oracle — which itself runs
    `closest_hit_bvh`, already validated against brute force in test_bvh.
    Mixed sphere/quad leaves exercise the segregated leaf ranges and the
    near/far stack discipline (VERDICT round-2 item 3: this kernel mode
    previously had no correctness test). Model: the reference validates its
    GPU path against the CPU renderer (StaticCamera.cpp:169-178)."""
    monkeypatch.setenv("RTX_BVH_STACK", "1")
    from real_time_ray_tracing_engine_tpu.ops.wavefront_pallas import \
        _use_unrolled
    rng = np.random.default_rng(7)
    objs = []
    for i in range(60):
        c = tuple(map(float, rng.uniform(-5, 5, 3)))
        albedo = tuple(map(float, rng.uniform(0.2, 0.9, 3)))
        m = (rt.Lambertian(rt.SolidColor(albedo)) if i % 4
             else rt.Metal(albedo, fuzz=0.3))
        objs.append(rt.Sphere(c, 0.45, m))
    for i in range(45):
        c = rng.uniform(-5.0, 5.0, 3)
        u = rng.uniform(0.4, 1.3, 3) * np.array([1.0, 0.0, 1.0])
        v = rng.uniform(0.4, 1.3, 3) * np.array([0.0, 1.0, 1.0])
        albedo = tuple(map(float, rng.uniform(0.2, 0.9, 3)))
        objs.append(rt.Quad(tuple(map(float, c)), tuple(map(float, u)),
                            tuple(map(float, v)),
                            rt.Lambertian(rt.SolidColor(albedo))))
    light = rt.Sphere((0, 9, 0), 2.0,
                      rt.DiffuseLight(rt.SolidColor((5, 5, 5))))
    objs.append(light)
    scene = rt.Scene(objects=objs, lights=[light],
                     camera=rt.CameraConfig(
                         image_width=48, aspect_ratio=1.0,
                         samples_per_pixel=4, max_depth=4, vfov=45,
                         lookfrom=(0, 2, 12), lookat=(0, 0, 0),
                         background=(0.4, 0.5, 0.7)))
    flat = compile_scene(scene, use_bvh=True)
    assert flat.use_bvh
    assert not _use_unrolled(flat.sph_center.shape[0],
                             flat.quad_corner.shape[0],
                             flat.mat_type.shape[0], flat.tex_type.shape[0])
    assert supports_pallas(flat)
    img_p, img_j = _compare(scene, use_bvh=True)
    _assert_close(img_p, img_j)


def test_vscan_multichunk_matches_oracle():
    """The vectorized prim-chunk scan across MULTIPLE 128-prim Morton
    chunks (closest_hit_vscan): per-chunk (128 prims x 128 rays) outer-
    product tests, whole-tile chunk-AABB culling, the bitcast winner-key
    carry across chunks, and the once-per-bounce chunked winner gather.
    300 spheres -> C=3 chunks; a few movers exercise the motion columns."""
    import real_time_ray_tracing_engine_tpu.ops.wavefront_pallas as wp
    rng = np.random.default_rng(3)
    objs = []
    for i in range(300):
        c = tuple(map(float, rng.uniform(-6, 6, 3)))
        albedo = tuple(map(float, rng.uniform(0.2, 0.9, 3)))
        c2 = (c[0], c[1] + 0.3, c[2]) if i % 11 == 0 else None
        objs.append(rt.Sphere(c, 0.35,
                              rt.Lambertian(rt.SolidColor(albedo)),
                              center2=c2))
    light = rt.Sphere((0, 10, 0), 2.0,
                      rt.DiffuseLight(rt.SolidColor((5, 5, 5))))
    objs.append(light)
    scene = rt.Scene(objects=objs, lights=[light],
                     camera=rt.CameraConfig(
                         image_width=32, aspect_ratio=1.0,
                         samples_per_pixel=4, max_depth=3, vfov=40,
                         lookfrom=(0, 2, 14), lookat=(0, 0, 0),
                         background=(0.5, 0.6, 0.8)))
    flat = compile_scene(scene)
    assert wp._kernel_modes(flat)[3]                   # vscan selected
    assert -(-flat.sph_center.shape[0] // wp.VCHUNK) >= 3
    img_p, img_j = _compare(scene)
    _assert_close(img_p, img_j)


def test_lane_bvh_mode_matches_oracle(monkeypatch):
    """Per-lane stackless skip-link BVH traversal (all-sphere use_bvh
    scenes): every lane walks its own escape-pointer chain via 128-lane
    dynamic gathers, with bf16-packed conservative boxes and one-prim-per-
    step leaf draining (ops.wavefront_pallas.closest_hit_lane). Must match
    the pure-JAX oracle exactly like every other kernel mode. The mode is
    opt-in (RTX_LANE_BVH) while its v5e hardware fault is open."""
    monkeypatch.setenv("RTX_LANE_BVH", "1")
    rng = np.random.default_rng(11)
    objs = []
    for i in range(90):
        c = tuple(map(float, rng.uniform(-5, 5, 3)))
        albedo = tuple(map(float, rng.uniform(0.2, 0.9, 3)))
        m = (rt.Lambertian(rt.SolidColor(albedo)) if i % 3
             else rt.Metal(albedo, fuzz=0.2))
        # a few movers exercise the motion-blur columns of the lane tables
        c2 = (c[0], c[1] + 0.3, c[2]) if i % 7 == 0 else None
        objs.append(rt.Sphere(c, 0.45, m, center2=c2))
    light = rt.Sphere((0, 9, 0), 2.0,
                      rt.DiffuseLight(rt.SolidColor((5, 5, 5))))
    objs.append(light)
    scene = rt.Scene(objects=objs, lights=[light],
                     camera=rt.CameraConfig(
                         image_width=48, aspect_ratio=1.0,
                         samples_per_pixel=4, max_depth=4, vfov=45,
                         lookfrom=(0, 2, 12), lookat=(0, 0, 0),
                         background=(0.4, 0.5, 0.7)))
    flat = compile_scene(scene, use_bvh=True)
    assert flat.use_bvh and flat.n_quads == 0
    from real_time_ray_tracing_engine_tpu.ops.wavefront_pallas import \
        _use_unrolled
    assert not _use_unrolled(flat.sph_center.shape[0],
                             flat.quad_corner.shape[0],
                             flat.mat_type.shape[0], flat.tex_type.shape[0])
    img_p, img_j = _compare(scene, use_bvh=True)
    _assert_close(img_p, img_j)


def test_bouncing_spheres_supported():
    """The second reference driver scene (485 prims, ~460 materials,
    main.cpp:73-131) is inside the scan-mode gate."""
    flat = compile_scene(builders.bouncing_spheres())
    assert flat.n_prims > 64
    assert supports_pallas(flat)


def test_cornell_smoke_matches_oracle():
    """Constant mediums run in-kernel (free-flight scattering over the
    boundary entry/exit span, ConstantMedium.cpp:25-96 semantics)."""
    scene = builders.cornell_smoke()
    scene.camera.image_width = 48
    assert compile_scene(scene).n_mediums == 2
    img_p, img_j = _compare(scene)
    _assert_close(img_p, img_j)


def test_supports_gate():
    cornell = compile_scene(builders.cornell_box())
    assert supports_pallas(cornell)
    # constant mediums are inside the gate (up to MAX_MEDIUMS)
    assert supports_pallas(compile_scene(builders.cornell_smoke()))
    boxes = [rt.ConstantMedium(
        rt.Box((i, 0, 0), (i + 1, 1, 1),
               rt.Lambertian(rt.SolidColor((1, 1, 1)))),
        0.1, rt.SolidColor((1, 1, 1))) for i in range(5)]
    assert not supports_pallas(compile_scene(rt.Scene(objects=boxes)))
    # noise textures are INSIDE the gate since the hash-noise redesign
    marble = rt.Scene(objects=[
        rt.Sphere((0, 0, 0), 1.0, rt.Lambertian(rt.Noise(4.0)))])
    assert supports_pallas(compile_scene(marble))
    # checker with non-solid children is in-gate in EVERY mode since
    # round 4: unrolled by static texture-DAG recursion, vscan/BVH/lane by
    # per-lane gather descent (tex_eval_dag) — including large scenes
    nested = rt.Scene(objects=[rt.Sphere(
        (0, 0, 0), 1.0, rt.Lambertian(rt.Checker(
            1.0, rt.Noise(4.0), rt.SolidColor((1, 1, 1)))))])
    assert supports_pallas(compile_scene(nested))
    big_nested = rt.Scene(objects=[rt.Sphere(
        (i * 3.0, 0, 0), 1.0, rt.Lambertian(rt.Checker(
            1.0, rt.Noise(4.0), rt.SolidColor((1, 1, 1)))))
        for i in range(80)])
    assert supports_pallas(compile_scene(big_nested))


def test_nested_checker_matches_oracle():
    """Texture-DAG recursion (VERDICT round-1 item 9 / ROADMAP parity): a
    checker whose even child is a nested checker and odd child is Perlin
    marble renders in-kernel and matches the pure-JAX oracle."""
    inner = rt.Checker(0.31, rt.SolidColor((0.9, 0.1, 0.1)),
                       rt.SolidColor((0.1, 0.1, 0.9)))
    tex = rt.Checker(1.1, inner, rt.Noise(3.0))
    cam = rt.CameraConfig(aspect_ratio=1.0, image_width=32,
                          samples_per_pixel=4, max_depth=4,
                          lookfrom=(0, 2, 6), lookat=(0, 1, 0),
                          sky_gradient=True)
    # floor at y=0.513: keeps hit points OFF checker cell boundaries, where
    # fp order-of-operations noise between engines legitimately flips parity
    scene = rt.Scene(objects=[
        rt.Quad((-8, 0.513, -8), (16, 0, 0), (0, 0, 16), rt.Lambertian(tex)),
        rt.Sphere((0, 1.5, 0), 1.0, rt.Lambertian(tex))], camera=cam)
    flat = compile_scene(scene)
    assert flat.checker_depth == 2 and supports_pallas(flat)
    img_p, img_j = _compare(scene)
    _assert_close(img_p, img_j)


def test_vscan_nested_checker_matches_oracle():
    """Nested checker DAGs in the NON-unrolled kernel (VERDICT round-3 item
    7): >64 prims select vscan mode, whose resolved per-prim rows only
    carry depth-1 children — deeper DAGs now descend the vtex gather table
    per lane (tex_eval_dag) instead of gating the scene to the jax engine.
    Depth-2 checker over solid + marble children, validated vs the
    pure-JAX oracle like every other kernel mode."""
    import real_time_ray_tracing_engine_tpu.ops.wavefront_pallas as wp
    inner = rt.Checker(0.31, rt.SolidColor((0.9, 0.1, 0.1)),
                       rt.SolidColor((0.1, 0.1, 0.9)))
    tex = rt.Checker(1.1, inner, rt.Noise(3.0))
    rng = np.random.default_rng(13)
    objs = [rt.Quad((-10, 0.513, -10), (20, 0, 0), (0, 0, 20),
                    rt.Lambertian(tex))]
    for i in range(78):
        c = tuple(map(float, rng.uniform(-5, 5, 2)))
        albedo = tuple(map(float, rng.uniform(0.2, 0.9, 3)))
        m = rt.Lambertian(tex if i % 4 == 0 else rt.SolidColor(albedo))
        objs.append(rt.Sphere((c[0], 1.1, c[1]), 0.35, m))
    cam = rt.CameraConfig(aspect_ratio=1.0, image_width=32,
                          samples_per_pixel=4, max_depth=3,
                          lookfrom=(0, 3, 9), lookat=(0, 1, 0),
                          sky_gradient=True)
    scene = rt.Scene(objects=objs, camera=cam)
    flat = compile_scene(scene)
    assert flat.checker_depth == 2 and flat.n_prims > 64
    assert wp._kernel_modes(flat)[3] and supports_pallas(flat)
    img_p, img_j = _compare(scene)
    _assert_close(img_p, img_j)


def test_complex_medium_boundary_matches_oracle():
    """Cap lift (VERDICT round-1 item 9): a constant-medium boundary that is
    a Group of TWO boxes (12 quads) compiles — the med-quad table grows past
    the old 6-quad row — and the kernel matches the oracle on it."""
    white = rt.Lambertian(rt.SolidColor((1, 1, 1)))
    fog = rt.ConstantMedium(
        rt.Group([rt.Box((-2, 0, -2), (2, 2, 2), white),
                  rt.Box((-1, 2, -1), (1, 3, 1), white)]),
        0.4, rt.SolidColor((0.8, 0.7, 0.6)))
    # a second medium with a plain box keeps rows ragged across mediums
    fog2 = rt.ConstantMedium(
        rt.Box((3, 0, -1), (5, 4, 1), white),
        0.2, rt.SolidColor((0.3, 0.4, 0.9)))
    cam = rt.CameraConfig(aspect_ratio=1.0, image_width=32,
                          samples_per_pixel=4, max_depth=4,
                          lookfrom=(0, 2, 9), lookat=(0, 1, 0),
                          sky_gradient=True)
    scene = rt.Scene(objects=[
        rt.Quad((-8, 0, -8), (16, 0, 0), (0, 0, 16),
                rt.Lambertian(rt.SolidColor((0.5, 0.5, 0.5)))),
        fog, fog2], camera=cam)
    flat = compile_scene(scene)
    assert flat.med_quad_corner.shape[1] == 12
    assert supports_pallas(flat)
    img_p, img_j = _compare(scene)
    _assert_close(img_p, img_j)


def test_multi_sphere_medium_boundary_matches_oracle():
    """Cap lift (VERDICT round-2 item 5): a constant-medium boundary made of
    TWO spheres compiles (med tables grow an MS axis) and the kernel matches
    the oracle. Span semantics = first two crossings of the union, the
    reference's double-hit contract (ConstantMedium.cpp:25-96)."""
    white = rt.Lambertian(rt.SolidColor((1, 1, 1)))
    fog = rt.ConstantMedium(
        rt.Group([rt.Sphere((-1.2, 1, 0), 1.5, white),
                  rt.Sphere((1.2, 1, 0), 1.5, white)]),
        0.5, rt.SolidColor((0.9, 0.6, 0.3)))
    cam = rt.CameraConfig(aspect_ratio=1.0, image_width=32,
                          samples_per_pixel=4, max_depth=4,
                          lookfrom=(0, 1.5, 8), lookat=(0, 1, 0),
                          sky_gradient=True)
    scene = rt.Scene(objects=[
        rt.Quad((-8, 0, -8), (16, 0, 0), (0, 0, 16),
                rt.Lambertian(rt.SolidColor((0.5, 0.5, 0.5)))),
        fog], camera=cam)
    flat = compile_scene(scene)
    assert flat.med_sph_center.shape[1] == 2
    assert supports_pallas(flat)
    img_p, img_j = _compare(scene)
    # the fog must actually scatter: remove it and the image changes a lot
    clear = rt.Scene(objects=scene.objects[:1], camera=cam)
    _, img_clear = _compare(clear)
    assert np.abs(img_j - img_clear).mean() > 0.05
    _assert_close(img_p, img_j)


def test_many_lights_in_gate():
    """>8 MIS lights stay on the fast path (cap raised to 32)."""
    objs = [rt.Quad((i * 3, 8, 0), (1, 0, 0), (0, 0, 1),
                    rt.DiffuseLight(rt.SolidColor((4, 4, 4))))
            for i in range(9)]
    objs.append(rt.Sphere((0, 1, 0), 1.0,
                          rt.Lambertian(rt.SolidColor((0.5, 0.5, 0.5)))))
    scene = rt.Scene(objects=objs, lights=objs[:9])
    flat = compile_scene(scene)
    assert flat.n_lights == 9
    assert supports_pallas(flat)


def test_pick_engine_auto_on_cpu_is_jax():
    flat = compile_scene(builders.cornell_box())
    assert pick_engine(flat, "auto") == "jax"       # tests run on CPU
    assert pick_engine(flat, "pallas") == "pallas"
    with pytest.raises(ValueError):
        # forcing engine=pallas on a gated scene (> MAX_MEDIUMS constant
        # mediums — nested texture DAGs no longer gate since round 4) is a
        # hard error with the gate reason
        many_mediums = compile_scene(rt.Scene(objects=[
            rt.ConstantMedium(
                rt.Box((i, 0, 0), (i + 1, 1, 1),
                       rt.Lambertian(rt.SolidColor((1, 1, 1)))),
                0.1, rt.SolidColor((1, 1, 1))) for i in range(5)]))
        pick_engine(many_mediums, "pallas")


def test_sharded_pallas_matches_sharded_jax():
    """Pallas engine under shard_map on the 8-device CPU mesh: absolute
    pixel ids via row0 keep RNG streams mesh-layout-invariant, so the two
    engines agree shard-for-shard."""
    from real_time_ray_tracing_engine_tpu.parallel.mesh import (
        make_render_mesh, render_sharded)
    scene = builders.cornell_box()
    scene.camera.image_width = 32
    flat = compile_scene(scene)
    cam = cam_mod.derive(scene.camera)
    mesh = make_render_mesh(n_tile=4, n_sample=2)
    kw = dict(mesh=mesh, width=32, height=32, n_strata=2, max_depth=3,
              sky_gradient=False)
    img_p = np.asarray(render_sharded(flat, cam, 0, engine="pallas", **kw))
    img_j = np.asarray(render_sharded(flat, cam, 0, engine="jax", **kw))
    assert np.isfinite(img_p).all()
    diff = np.abs(img_p - img_j)
    assert (diff > 1e-3).mean() < 0.01
    assert abs(img_p.mean() - img_j.mean()) < 2e-3


def test_progressive_stratum_equals_batch_sample():
    """One n_samples=2 pass == two n_samples=1 passes (regeneration keeps
    per-(pixel,sample) streams intact)."""
    scene = builders.cornell_box()
    scene.camera.image_width = 32
    flat = compile_scene(scene)
    cam = cam_mod.derive(scene.camera)
    kw = dict(width=32, height=32, n_strata=2, max_depth=3,
              sky_gradient=False, rows_per_tile=8, interpret=True)
    both = np.asarray(render_pass_pallas(
        flat, cam, jnp.uint32(0), jnp.int32(0), n_samples=2, **kw))
    s0 = np.asarray(render_pass_pallas(
        flat, cam, jnp.uint32(0), jnp.int32(0), n_samples=1, **kw))
    s1 = np.asarray(render_pass_pallas(
        flat, cam, jnp.uint32(0), jnp.int32(1), n_samples=1, **kw))
    np.testing.assert_allclose(both, s0 + s1, rtol=1e-5, atol=1e-5)


def test_compacted_schedule_matches_single_pass():
    """Two-phase capped + lane-compacted scheduling (VERDICT round-2 item 5)
    must reproduce the single-pass kernel exactly: the compaction permutes
    lane->pixel assignment (RNG keys are pixel-id-based, so streams are
    unchanged) and splits each lane's radiance sum at the cap boundary (same
    association up to one extra add). Covers unrolled (Cornell), scan
    (bouncing spheres) and medium (cornell_smoke) kernel modes, with a cap
    small enough that phase 2 carries real mid-path state."""
    from real_time_ray_tracing_engine_tpu.ops.wavefront_pallas import (
        render_pass_pallas_compacted)

    for scene, use_bvh in ((builders.cornell_box(), False),
                           (builders.bouncing_spheres(), False),
                           (builders.bouncing_spheres(), True),
                           (builders.cornell_smoke(), False)):
        scene.camera.image_width = 40
        flat = compile_scene(scene, use_bvh=use_bvh)
        cam = cam_mod.derive(scene.camera)
        w, h = cam_mod.image_size(scene.camera)
        kw = dict(width=w, height=h, n_strata=2, max_depth=8, n_samples=4,
                  sky_gradient=scene.camera.sky_gradient, interpret=True)
        one = np.asarray(render_pass_pallas(
            flat, cam, jnp.uint32(7), jnp.int32(3), **kw))
        two = np.asarray(render_pass_pallas_compacted(
            flat, cam, jnp.uint32(7), jnp.int32(3), cap=6, **kw))
        assert np.allclose(one, two, atol=1e-5), (scene.name, use_bvh)
    # 3-phase (capped resume pass between compactions) + an explicit
    # multi-phase caps schedule (the round-4 production default shape for
    # large scenes) on the last scene
    three = np.asarray(render_pass_pallas_compacted(
        flat, cam, jnp.uint32(7), jnp.int32(3), cap=6, phases=3, **kw))
    assert np.allclose(one, three, atol=1e-5)
    four = np.asarray(render_pass_pallas_compacted(
        flat, cam, jnp.uint32(7), jnp.int32(3), caps=(4, 4), **kw))
    assert np.allclose(one, four, atol=1e-5)


def test_vquad_chunks_match_oracle():
    """Quad counts beyond MAX_QUADS_VSCAN move to vectorized 128-quad
    chunk tables (vquad; round 4) instead of the per-quad scalar loop or
    the opt-in stack traversal: Morton-chunked quad tests, chunk-AABB
    culling behind the sphere chunk boxes, and a selected-winner merge
    with exact cross-class t comparison. 90 quads + 40 spheres + an
    emitter, validated vs the pure-JAX oracle."""
    import real_time_ray_tracing_engine_tpu.ops.wavefront_pallas as wp
    rng = np.random.default_rng(17)
    objs = []
    for i in range(90):
        c = rng.uniform(-5.0, 5.0, 3)
        u = rng.uniform(0.4, 1.2, 3) * np.array([1.0, 0.0, 1.0])
        v = rng.uniform(0.4, 1.2, 3) * np.array([0.0, 1.0, 1.0])
        albedo = tuple(map(float, rng.uniform(0.2, 0.9, 3)))
        objs.append(rt.Quad(tuple(map(float, c)), tuple(map(float, u)),
                            tuple(map(float, v)),
                            rt.Lambertian(rt.SolidColor(albedo))))
    for i in range(40):
        c = tuple(map(float, rng.uniform(-5, 5, 3)))
        albedo = tuple(map(float, rng.uniform(0.2, 0.9, 3)))
        m = (rt.Metal(albedo, fuzz=0.3) if i % 6 == 0
             else rt.Lambertian(rt.SolidColor(albedo)))
        objs.append(rt.Sphere(c, 0.4, m))
    light = rt.Sphere((0, 9, 0), 2.0,
                      rt.DiffuseLight(rt.SolidColor((5, 5, 5))))
    objs.append(light)
    scene = rt.Scene(objects=objs, lights=[light],
                     camera=rt.CameraConfig(
                         image_width=40, aspect_ratio=1.0,
                         samples_per_pixel=4, max_depth=4, vfov=50,
                         lookfrom=(0, 2, 12), lookat=(0, 0, 0),
                         background=(0.4, 0.5, 0.7)))
    flat = compile_scene(scene)
    assert wp._kernel_modes(flat)[3]
    assert flat.quad_corner.shape[0] > wp.MAX_QUADS_VSCAN
    assert supports_pallas(flat)
    img_p, img_j = _compare(scene)
    _assert_close(img_p, img_j)
