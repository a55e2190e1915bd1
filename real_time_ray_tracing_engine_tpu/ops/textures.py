"""Texture evaluation over the flattened texture table.

Replaces the reference's Texture virtual dispatch / CudaTexture tagged union
(Texture.hpp:14, Texture.cuh:89-113): gather the row for each ray's texture
index, evaluate every texture family with masked arithmetic, select by type
code. Checker children (CheckerTexture.cpp:14-55 supports recursive textures)
resolve through arbitrarily nested chains: the static scene.checker_depth
bounds an unrolled per-level descent, after which every lane's index points
at a solid or noise leaf.
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


def resolve_checker(scene: FlatScene, tidx, p):
    """Descend checker chains until every lane's index is a leaf row.

    Each level gathers the current row's scale, computes checker parity on
    floor(p/scale) (CheckerTexture.cpp:34-55 uses inv_scale * p; scale here
    is the world-space cell size), and steps to the parity-selected child.
    scene.checker_depth (static) bounds the unrolled loop."""
    for _ in range(scene.checker_depth):
        ttype = scene.tex_type[tidx]
        scale = scene.tex_scale[tidx]
        inv = 1.0 / jnp.maximum(scale, 1e-12)
        fl = jnp.floor(inv[..., None] * p).astype(jnp.int32)
        even = (fl[..., 0] + fl[..., 1] + fl[..., 2]) % 2 == 0
        child = jnp.where(even, scene.tex_child_even[tidx],
                          scene.tex_child_odd[tidx])
        tidx = jnp.where(ttype == TEX_CHECKER, child, tidx)
    return tidx


def texture_value(scene: FlatScene, tidx, u, v, p):
    """Color of texture `tidx` (N,) int32 at surface point p (N, 3).

    The noise branch is gated on the STATIC scene.has_noise flag: turbulence
    is 7 octaves x 8 table gathers per ray, and evaluating it masked for
    noise-free scenes dominated the traced-scene integrator's HBM traffic.
    """
    leaf = resolve_checker(scene, tidx, p)
    return _base_value(scene, leaf, p)
