"""Native (C++) scene-toolchain components, loaded via ctypes.

Build with scripts/build_native.sh; every consumer has a numpy fallback, so
the package works without the shared libraries.
"""
from __future__ import annotations

import ctypes
import os

_DIR = os.path.dirname(os.path.abspath(__file__))


def _ensure_built() -> str | None:
    """Return the path to libbvh.so, compiling it on first use.

    The binary is not committed (scripts/build_native.sh builds it too); a
    quiet one-shot g++ invocation here keeps `pip install -e . && import`
    working without a separate build step. Returns None when no toolchain
    is available — every consumer has a numpy fallback."""
    path = os.path.join(_DIR, "libbvh.so")
    srcs = [os.path.join(_DIR, "bvh_builder.cpp"),
            os.path.join(_DIR, "ppm_io.cpp")]
    if os.path.exists(path) and all(
            os.path.getmtime(path) >= os.path.getmtime(s) for s in srcs):
        return path
    import shutil
    import subprocess
    import tempfile
    cxx = shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        return path if os.path.exists(path) else None
    # build to a temp file + atomic rename: parallel test workers race here
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            [cxx, "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", tmp] + srcs,
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, path)
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)
        return path if os.path.exists(path) else None
    return path


def load_bvh_lib():
    """Return the libbvh ctypes handle, or None if not built/buildable."""
    path = _ensure_built()
    if path is None:
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
    if hasattr(lib, "rtx_encode_ppm_p3"):
        lib.rtx_encode_ppm_p3.restype = ctypes.c_int64
        lib.rtx_encode_ppm_p3.argtypes = [
            u8, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    return lib


def encode_ppm_p3(rgb_bytes) -> bytes | None:
    """Encode (N, 3) uint8 pixels as P3 body text via the native encoder;
    None when the library (or the symbol) is unavailable."""
    import numpy as np
    lib = load_bvh_lib()
    if lib is None or not hasattr(lib, "rtx_encode_ppm_p3"):
        return None
    flat = np.ascontiguousarray(rgb_bytes, np.uint8).reshape(-1, 3)
    n = flat.shape[0]
    buf = ctypes.create_string_buffer(n * 12 + 1)
    written = lib.rtx_encode_ppm_p3(flat, n, buf, len(buf))
    if written < 0:
        return None
    return buf.raw[:written]
