"""Generate reference-renderer golden images for tests/test_reference_images.py.

Runs the REFERENCE engine's CPU path (built by scripts/build_reference.sh)
on this repo's validation scenes and stores the resulting PPMs (as uint8
arrays + scene JSON + metadata) under tests/goldens/reference/.

The reference RNG is non-deterministic (thread-local mt19937 seeded from
random_device, reference src/utils/math/Utility.hpp:16-37), so goldens are
Monte-Carlo estimates: we render at high spp so the reference-side noise is
small against the comparison tolerance, and the test budget accounts for the
rest (see tests/test_reference_images.py for the tolerance derivation).

Scenes that use this repo's sky-gradient background are validated through a
solid-background variant: the reference has no gradient background
(Camera.cpp:242-243 returns a constant color on miss), and this is a
background-only substitution — every estimator feature (intersection, MIS,
materials, textures, DOF, motion blur, volumes) is unchanged.

Usage: python scripts/gen_reference_goldens.py [scene ...]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from dataclasses import replace

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from real_time_ray_tracing_engine_tpu.scene import builders, schema  # noqa: E402
from real_time_ray_tracing_engine_tpu.utils.color import read_ppm  # noqa: E402

BUILD = os.path.join(REPO, "build_ref")
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens", "reference")


def _solid_bg(scene: schema.Scene) -> schema.Scene:
    cam = replace(scene.camera, sky_gradient=False,
                  background=(0.70, 0.80, 1.00))
    return schema.Scene(objects=scene.objects, lights=scene.lights,
                        camera=cam, name=scene.name,
                        perlin_seed=scene.perlin_seed)


# (scene factory, width, reference spp, max depth, use_bvh)
# Widths/spp sized so 2-core reference renders stay in minutes and the
# reference-side MC noise after 8x8 cell pooling is << the test tolerance.
CONFIGS = {
    "simple_sphere": (lambda: _solid_bg(builders.simple_sphere()),
                      200, 1024, 16, False),
    "three_spheres": (lambda: _solid_bg(builders.three_spheres()),
                      200, 1024, 16, False),
    "cornell_box": (builders.cornell_box, 150, 2048, 20, True),
    "cornell_smoke": (builders.cornell_smoke, 150, 2048, 20, True),
    "textured_spheres": (builders.textured_spheres, 200, 576, 12, True),
    "bouncing_spheres": (lambda: builders.bouncing_spheres(image_width=200),
                         200, 576, 12, True),
}


def generate(name: str) -> None:
    factory, width, spp, depth, use_bvh = CONFIGS[name]
    scene = factory()
    os.makedirs(os.path.join(BUILD, "scenes"), exist_ok=True)
    scene_path = os.path.join(BUILD, "scenes", f"{name}_golden.json")
    schema.save_scene(scene, scene_path)

    cmd = [os.path.join(BUILD, "ref_driver"), scene_path, f"{name}_golden",
           "--parallel", "--width", str(width), "--samples", str(spp),
           "--depth", str(depth)]
    if use_bvh:
        cmd.append("--bvh")
    t0 = time.time()
    subprocess.run(cmd, cwd=BUILD, check=True, capture_output=True)
    dt = time.time() - t0
    img = read_ppm(os.path.join(BUILD, "output", f"{name}_golden.ppm"))

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, f"{name}.npz"),
        image=np.asarray(img, np.uint8))
    # store the exact scene the reference rendered, so the test compares
    # the same geometry/background variant without re-deriving it
    import shutil
    shutil.copy(scene_path, os.path.join(GOLDEN_DIR, f"{name}_scene.json"))
    meta = {"scene": name, "width": width, "ref_spp": spp, "depth": depth,
            "use_bvh": use_bvh, "render_seconds": round(dt, 1),
            "scene_json_sha": _sha(scene_path)}
    with open(os.path.join(GOLDEN_DIR, f"{name}.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[golden] {name}: {img.shape} ref_spp={spp} in {dt:.0f}s")


def _sha(path: str) -> str:
    import hashlib
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


if __name__ == "__main__":
    names = sys.argv[1:] or list(CONFIGS)
    if not os.path.exists(os.path.join(BUILD, "ref_driver")):
        subprocess.run([os.path.join(REPO, "scripts", "build_reference.sh")],
                       check=True)
    for n in names:
        generate(n)
