"""Color conversion and PPM I/O.

Byte-comparable with the reference's output path: gamma-2 (sqrt) conversion
(src/utils/ColorUtility.hpp:11-16), clamp to [0, 0.999] and scale by 256
(:19-26), P3 ASCII PPM (:30-37, header src/core/camera/StaticCamera.cpp:57).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def linear_to_gamma(c):
    """Gamma-2: sqrt of nonnegative components."""
    return jnp.sqrt(jnp.maximum(c, 0.0))


@jax.jit
def to_bytes(img):
    """(H, W, 3) linear float image -> (H, W, 3) uint8, reference clamp rule."""
    g = linear_to_gamma(img)
    return (256.0 * jnp.clip(g, 0.0, 0.999)).astype(jnp.uint8)


def write_ppm(path, img):
    """Write a linear float (H, W, 3) image as P3 ASCII PPM.

    One "r g b" triple per line, matching the reference's write_color
    (ColorUtility.hpp:30-37, header StaticCamera.cpp:57). Uses the native
    C++ encoder when built (native/ppm_io.cpp, ~100x numpy.savetxt)."""
    b = np.asarray(to_bytes(img))
    h, w, _ = b.shape
    from ..native import encode_ppm_p3
    body = encode_ppm_p3(b)
    with open(path, "wb") as f:
        f.write(f"P3\n{w} {h}\n255\n".encode())
        if body is not None:
            f.write(body)
        else:
            rows = b.reshape(-1, 3).astype(str)
            f.write("\n".join(" ".join(r) for r in rows).encode() + b"\n")


def read_ppm(path):
    """Read a P3 ASCII PPM into a uint8 (H, W, 3) array."""
    with open(path) as f:
        tokens = f.read().split()
    assert tokens[0] == "P3", "only P3 ASCII PPM supported"
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    data = np.array(tokens[4:4 + w * h * 3], dtype=np.int64)
    assert maxv == 255
    return data.reshape(h, w, 3).astype(np.uint8)
