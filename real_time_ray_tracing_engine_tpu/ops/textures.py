"""Texture evaluation over the flattened texture table.

Replaces the reference's Texture virtual dispatch / CudaTexture tagged union
(Texture.hpp:14, Texture.cuh:89-113): gather the row for each ray's texture
index, evaluate every texture family with masked arithmetic, select by type
code. Checker children (CheckerTexture.cpp:14-55 supports recursive textures)
are evaluated one level deep — solid or noise children, which covers all
reference scenes.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene.flat import FlatScene, TEX_SOLID, TEX_CHECKER, TEX_NOISE
from ..utils import perlin


def _noise_value(scene: FlatScene, scale, p):
    """Marble: 0.5*(1 + sin(scale*z + 10*turb(p,7))) (NoiseTexture.cpp:8-33)."""
    turb = perlin.turbulence(p, scene.perlin_seed, depth=7)
    g = 0.5 * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * turb))
    return g[..., None] * jnp.ones(3, p.dtype)


def _base_value(scene: FlatScene, tidx, p):
    """Solid-or-noise evaluation (used for checker children)."""
    solid = scene.tex_color[tidx]
    if not scene.has_noise:
        return solid
    ttype = scene.tex_type[tidx]
    noise = _noise_value(scene, scene.tex_scale[tidx], p)
    return jnp.where((ttype == TEX_NOISE)[..., None], noise, solid)


def texture_value(scene: FlatScene, tidx, u, v, p):
    """Color of texture `tidx` (N,) int32 at surface point p (N, 3).

    The noise branch is gated on the STATIC scene.has_noise flag: turbulence
    is 7 octaves x 8 table gathers per ray, and evaluating it masked for
    noise-free scenes dominated the traced-scene integrator's HBM traffic.
    """
    ttype = scene.tex_type[tidx]
    scale = scene.tex_scale[tidx]

    # checker parity on floor(p/scale) (CheckerTexture.cpp:34-55 uses
    # inv_scale * p; scale here is the world-space cell size)
    inv = 1.0 / jnp.maximum(scale, 1e-12)
    fl = jnp.floor(inv[..., None] * p).astype(jnp.int32)
    even = (fl[..., 0] + fl[..., 1] + fl[..., 2]) % 2 == 0
    child = jnp.where(even, scene.tex_child_even[tidx],
                      scene.tex_child_odd[tidx])
    checker = _base_value(scene, child, p)

    solid = scene.tex_color[tidx]
    out = jnp.where((ttype == TEX_CHECKER)[..., None], checker, solid)
    if scene.has_noise:
        noise = _noise_value(scene, scale, p)
        out = jnp.where((ttype == TEX_NOISE)[..., None], noise, out)
    return out
