"""Regenerate checked-in golden files for the scene compiler."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import real_time_ray_tracing_engine_tpu as rt
from real_time_ray_tracing_engine_tpu.scene.compile import compile_scene, golden_json

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")
os.makedirs(out, exist_ok=True)
for name in ["cornell_box", "cornell_smoke", "simple_sphere"]:
    g = golden_json(compile_scene(rt.builders.BUILTIN_SCENES[name]()))
    with open(os.path.join(out, f"{name}.json"), "w") as f:
        f.write(g)
    print("wrote", name, len(g), "bytes")
