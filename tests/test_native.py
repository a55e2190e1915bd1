"""Native (C++) scene-toolchain components vs their numpy fallbacks.

The reference's whole runtime is native C++ (SURVEY.md §2); here the
host-side toolchain pieces — SAH BVH builder, PPM encoder — are C++ with
semantics-identical Python fallbacks, and these tests pin the equivalence.
Skipped when libbvh.so is not built (scripts/build_native.sh).
"""
import numpy as np
import pytest

from real_time_ray_tracing_engine_tpu.native import (load_bvh_lib,
                                                     encode_ppm_p3)

needs_native = pytest.mark.skipif(load_bvh_lib() is None,
                                  reason="libbvh.so not built")


@needs_native
def test_ppm_encoder_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    b = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    body = encode_ppm_p3(b)
    assert body is not None
    expected = "\n".join(" ".join(str(v) for v in px)
                         for px in b.reshape(-1, 3)) + "\n"
    assert body.decode() == expected


@needs_native
def test_write_ppm_native_fallback_identical(tmp_path):
    import real_time_ray_tracing_engine_tpu.native as nat
    from real_time_ray_tracing_engine_tpu.utils.color import (write_ppm,
                                                              read_ppm,
                                                              to_bytes)
    img = np.random.default_rng(1).uniform(0, 1, (32, 40, 3)).astype(
        np.float32)
    p1 = str(tmp_path / "native.ppm")
    p2 = str(tmp_path / "python.ppm")
    write_ppm(p1, img)
    orig = nat.encode_ppm_p3
    nat.encode_ppm_p3 = lambda b: None
    try:
        write_ppm(p2, img)
    finally:
        nat.encode_ppm_p3 = orig
    assert open(p1, "rb").read().rstrip() == open(p2, "rb").read().rstrip()
    assert np.array_equal(read_ppm(p1), np.asarray(to_bytes(img)))


@needs_native
def test_native_bvh_builder_used_and_matches_numpy():
    """build_bvh prefers the native builder; images must match the numpy
    build (same SAH constants) — covered structurally by comparing the trees
    on a deterministic scene."""
    import real_time_ray_tracing_engine_tpu as rt
    from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene
    from real_time_ray_tracing_engine_tpu.ops import bvh as bvh_mod

    scene = rt.builders.cornell_box()
    flat = compile_scene(scene)
    nat_scene = bvh_mod.build_bvh(flat)
    # force the numpy fallback
    orig = bvh_mod._build_native
    bvh_mod._build_native = lambda *a, **k: None
    try:
        py_scene = bvh_mod.build_bvh(flat)
    finally:
        bvh_mod._build_native = orig
    # same prim partition sizes and node count class; traversal equivalence
    # is covered by test_bvh.py image comparisons
    assert nat_scene.use_bvh and py_scene.use_bvh
    assert nat_scene.bvh_prims.shape == py_scene.bvh_prims.shape
    assert set(np.asarray(nat_scene.bvh_prims).tolist()) == \
        set(np.asarray(py_scene.bvh_prims).tolist())
