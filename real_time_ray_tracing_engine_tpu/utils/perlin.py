"""Perlin noise: host-side table generation + traced evaluation.

Reference: src/core/PerlinNoise.hpp:43-79,140-205 — 256 random unit gradient
vectors, 3 permutation tables, trilinear Hermite-smoothed gradient
interpolation, 7-octave turbulence. Tables are generated on host (numpy,
seeded — the reference seeds from random_device so parity is distributional,
not bitwise; see PerlinNoiseConversions.cuh:10-19) and stored in the flattened
scene so CPU/TPU renders are identical.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

POINT_COUNT = 256


def make_tables(seed: int = 0):
    """Generate (grad (256,3) f32, perm_x/y/z (256,) i32) numpy tables."""
    rng = np.random.default_rng(seed)
    v = rng.uniform(-1.0, 1.0, size=(POINT_COUNT, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    perms = [rng.permutation(POINT_COUNT).astype(np.int32) for _ in range(3)]
    return v.astype(np.float32), perms[0], perms[1], perms[2]


def _hermite(t):
    return t * t * (3.0 - 2.0 * t)


def noise(grad, px, py, pz, p):
    """Gradient noise at points p (..., 3), in [-1, 1].

    Mirrors PerlinNoise.hpp:140-205: lattice gradients hashed by xor of three
    permutation tables, Hermite-faded trilinear interpolation — expressed as a
    vectorized gather + weighted sum over the 8 lattice corners.
    """
    pf = jnp.floor(p)
    uvw = p - pf
    ijk = pf.astype(jnp.int32)
    fade = _hermite(uvw)

    acc = jnp.zeros(p.shape[:-1], p.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                gi = px[(ijk[..., 0] + di) & 255] ^ \
                     py[(ijk[..., 1] + dj) & 255] ^ \
                     pz[(ijk[..., 2] + dk) & 255]
                g = grad[gi]
                weight = uvw - jnp.asarray([di, dj, dk], p.dtype)
                w = (jnp.where(di == 1, fade[..., 0], 1.0 - fade[..., 0]) *
                     jnp.where(dj == 1, fade[..., 1], 1.0 - fade[..., 1]) *
                     jnp.where(dk == 1, fade[..., 2], 1.0 - fade[..., 2]))
                acc = acc + w * jnp.sum(g * weight, axis=-1)
    return acc


def turbulence(grad, px, py, pz, p, depth: int = 7):
    """Sum of |noise| octaves (reference PerlinNoise.hpp:67-79)."""
    acc = jnp.zeros(p.shape[:-1], p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        acc = acc + weight * jnp.abs(noise(grad, px, py, pz, q))
        weight = weight * 0.5
        q = q * 2.0
    return acc
