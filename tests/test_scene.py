import json
import numpy as np

import real_time_ray_tracing_engine_tpu as rt
from real_time_ray_tracing_engine_tpu.scene.compile import (compile_scene,
                                                            golden_json)
from real_time_ray_tracing_engine_tpu.scene.schema import (
    scene_to_json, scene_from_json)


def test_json_roundtrip_all_builtins():
    for name, builder in rt.builders.BUILTIN_SCENES.items():
        s = builder()
        s2 = scene_from_json(scene_to_json(s))
        assert len(s2.objects) == len(s.objects), name
        assert len(s2.lights) == len(s.lights), name
        assert s2.camera.image_width == s.camera.image_width, name
        # compiled tables must be identical
        f1, f2 = compile_scene(s), compile_scene(s2)
        np.testing.assert_allclose(np.asarray(f1.sph_center),
                                   np.asarray(f2.sph_center), err_msg=name)
        np.testing.assert_allclose(np.asarray(f1.quad_corner),
                                   np.asarray(f2.quad_corner), err_msg=name)
        np.testing.assert_array_equal(np.asarray(f1.mat_type),
                                      np.asarray(f2.mat_type), err_msg=name)


def test_cornell_flat_counts():
    f = compile_scene(rt.builders.cornell_box())
    # world: 5 walls + light + 6 box faces = 12 quads, 1 glass sphere
    # lights: 1 quad + 1 sphere (inactive rows)
    assert f.n_spheres == 2 and f.n_quads == 13
    assert int(np.asarray(f.sph_active).sum()) == 1
    assert int(np.asarray(f.quad_active).sum()) == 12
    assert f.n_lights == 2 and f.n_mediums == 0


def test_cornell_smoke_mediums():
    f = compile_scene(rt.builders.cornell_smoke())
    assert f.n_mediums == 2
    nid = np.asarray(f.med_neg_inv_density)[:2]
    np.testing.assert_allclose(nid, -1.0 / 0.01, rtol=1e-6)
    # each medium boundary is a 6-quad box
    assert np.asarray(f.med_quad_active)[:2].sum() == 12


def test_bouncing_spheres_scale():
    s = rt.builders.bouncing_spheres(seed=3)
    f = compile_scene(s)
    assert f.n_spheres > 400  # ~480 random + ground + 3 hero
    assert f.n_quads == 0


def test_golden_json_stable(tmp_path):
    """Golden-file validation of the scene compiler (the reference's debug
    JSON dump workflow, Camera.cpp:75-149): recompiling the same scene must
    produce the identical serialized flat scene."""
    f1 = compile_scene(rt.builders.cornell_box())
    f2 = compile_scene(rt.builders.cornell_box())
    g1, g2 = golden_json(f1), golden_json(f2)
    assert g1 == g2
    d = json.loads(g1)
    assert d["n_spheres"] == 2 and d["n_quads"] == 13
    assert d["sph_center"]["shape"] == [2, 3]


def test_golden_json_matches_checked_in():
    """Against the checked-in golden file (regenerate with
    scripts/regen_goldens.py when the schema intentionally changes)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "goldens",
                        "cornell_box.json")
    if not os.path.exists(path):
        import pytest
        pytest.skip("golden not generated yet")
    with open(path) as fh:
        want = fh.read()
    got = golden_json(compile_scene(rt.builders.cornell_box()))
    assert got == want


def test_camera_ray_geometry():
    from real_time_ray_tracing_engine_tpu.models import camera as cm
    from real_time_ray_tracing_engine_tpu.utils import rng as rtrng
    import jax.numpy as jnp
    cfg = rt.CameraConfig(image_width=101, aspect_ratio=1.0, vfov=90.0,
                          lookfrom=(0, 0, 0), lookat=(0, 0, -1),
                          focus_dist=1.0, samples_per_pixel=1)
    cam = cm.derive(cfg)
    w, h = cm.image_size(cfg)
    center_pix = (h // 2) * w + w // 2
    keys = rtrng.ray_keys(0, jnp.asarray([center_pix]), jnp.zeros(1, jnp.int32))
    org, dr, tm = cm.generate_rays(cam, w, jnp.asarray([center_pix]),
                                   jnp.asarray(0), 1, keys)
    d = np.asarray(dr[0])
    d = d / np.linalg.norm(d)
    # center pixel looks straight at -z (within a pixel of jitter)
    assert d[2] < -0.99
    assert float(tm[0]) >= 0.0 and float(tm[0]) < 1.0


def test_ppm_bytes_rule():
    import jax.numpy as jnp
    from real_time_ray_tracing_engine_tpu.utils.color import to_bytes
    img = jnp.asarray([[[0.0, 0.25, 1.5]]])
    b = np.asarray(to_bytes(img))
    # gamma-2 then clamp [0, 0.999] then *256 (ColorUtility.hpp:19-26)
    assert b[0, 0, 0] == 0
    assert b[0, 0, 1] == int(256 * 0.5)
    assert b[0, 0, 2] == int(256 * 0.999)


def test_scene_complexity_analyzer(tmp_path):
    """Analyzer parity with the reference's scene complexity dump
    (CudaSceneInitialization.cuh:74-246): object counts, compiled table
    accounting, and a readable report file."""
    from real_time_ray_tracing_engine_tpu.scene import builders
    from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene
    from real_time_ray_tracing_engine_tpu.scene.analyze import (analyze,
                                                                dump_report)
    scene = builders.cornell_box()
    flat = compile_scene(scene, use_bvh=True)
    rep = analyze(scene, flat)
    assert rep["objects"]["Quad"] >= 5          # walls + light
    assert rep["compiled"]["n_quads"] >= 11     # + box faces
    assert rep["compiled"]["bvh_nodes"] > 0
    assert rep["compiled"]["device_bytes"] > 0
    path = str(tmp_path / "complexity.txt")
    text = dump_report(scene, flat, path)
    assert "Scene Complexity" in text and "device memory" in text
    assert open(path).read() == text
