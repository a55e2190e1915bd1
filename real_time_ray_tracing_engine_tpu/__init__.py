"""TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`prabhask5/real-time-ray-tracing-engine` (C++/CUDA): MIS path tracing,
five material families, procedural textures, constant-density volumes,
SAH BVH, progressive rendering, and multi-device scaling via jax.sharding.
"""
from .scene.schema import (Scene, CameraConfig, Sphere, Quad, Box, Translate,
                           RotateY, ConstantMedium, Lambertian, Metal,
                           Dielectric, DiffuseLight, Isotropic, SolidColor,
                           Checker, Noise, load_scene, save_scene,
                           scene_to_json, scene_from_json)
from .scene.compile import compile_scene, golden_json
from .scene.flat import FlatScene
from .scene import builders
from .models.render import render, ProgressiveRenderer
from .models import camera
from .ops.integrator import trace
from .utils.color import write_ppm, read_ppm, to_bytes

__version__ = "0.1.0"
