"""Native (C++) scene-toolchain components, loaded via ctypes.

Build with scripts/build_native.sh; every consumer has a numpy fallback, so
the package works without the shared libraries.
"""
from __future__ import annotations

import ctypes
import os

_DIR = os.path.dirname(os.path.abspath(__file__))


def load_bvh_lib():
    """Return the libbvh ctypes handle, or None if not built."""
    path = os.path.join(_DIR, "libbvh.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    import numpy.ctypeslib as npc
    import numpy as np
    f32 = npc.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = npc.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8 = npc.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.rtx_build_bvh.restype = ctypes.c_int32
    lib.rtx_build_bvh.argtypes = [
        f32, f32, u8, ctypes.c_int32,              # bb_min, bb_max, active, n
        f32, f32, i32, i32, i32, u8,               # node arrays
        i32, ctypes.POINTER(ctypes.c_int32),       # prims, n_prims_out
        ctypes.c_int32,                            # max_nodes
    ]
    return lib
