"""Counter-based, sharding-invariant RNG for the path tracer.

The reference uses thread-local mt19937 on CPU (src/utils/math/Utility.hpp:16-37)
and per-pixel curandState on GPU (src/core/camera/CameraKernels.cu:15-25) — both
non-reproducible. Here every random draw is a pure function of
(seed, pixel_id, sample_id, bounce, draw_slot) via threefry, so renders are
deterministic and invariant to device-mesh layout (the same pixel gets the same
sample stream no matter which chip owns it).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Draw-slot labels within one bounce of the integrator. Each slot consumes a
# fixed number of uniforms out of one per-(ray,bounce) uniform block.
N_DRAWS = 12
(D_MEDIUM, D_PICK, D_LIGHT_SEL, D_LIGHT_U, D_LIGHT_V, D_MAT_U, D_MAT_V,
 D_FUZZ_U, D_FUZZ_V, D_REFL, D_SPARE0, D_SPARE1) = range(N_DRAWS)


def ray_keys(seed: int | jax.Array, pixel_ids, sample_ids):
    """Per-ray PRNG key: fold pixel and sample indices into a base key.

    pixel_ids, sample_ids: int32 arrays of the same shape (N,).
    Returns key array with a leading N axis.
    """
    if hasattr(seed, "dtype") and jax.dtypes.issubdtype(seed.dtype,
                                                        jax.dtypes.prng_key):
        base = seed
    else:
        base = jax.random.key(seed)
    k = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(base, pixel_ids)
    return jax.vmap(jax.random.fold_in)(k, sample_ids)


def bounce_uniforms(keys, bounce, n=N_DRAWS):
    """One (N, n) block of U[0,1) draws for a bounce; keys: (N,) key array."""
    kb = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, bounce)
    return jax.vmap(lambda k: jax.random.uniform(k, (n,)))(kb)


def uniforms(keys, tag, shape_suffix=()):
    """(N, *suffix) uniforms for an integer tag (e.g. a camera draw id)."""
    kb = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, tag)
    return jax.vmap(lambda k: jax.random.uniform(k, shape_suffix))(kb)


def unit_vector_from_uv(u1, u2):
    """Uniform point on the unit sphere from two uniforms
    (replaces reference random_unit_vector, Vec3Utility.hpp:53-62)."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def cosine_direction_from_uv(u1, u2):
    """Cosine-weighted hemisphere direction in local (z-up) frame
    (reference: Vec3Utility.hpp:94-104 random_cosine_direction)."""
    phi = 2.0 * jnp.pi * u1
    sq2 = jnp.sqrt(u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u2))
    return jnp.stack([jnp.cos(phi) * sq2, jnp.sin(phi) * sq2, z], axis=-1)


def in_unit_disk_from_uv(u1, u2):
    """Uniform point in the unit disk (for defocus sampling;
    reference: Vec3Utility.hpp random_in_unit_disk)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
