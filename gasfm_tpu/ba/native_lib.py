"""ctypes loader for the native BA solver, with on-demand compilation.

The C++ source (native/ba_solver.cpp) is compiled once per environment into
native/libgasfm_ba.so; subsequent imports reuse the cached binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "ba_solver.cpp")
_SO = os.path.join(_NATIVE_DIR, "libgasfm_ba.so")

_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
        "-fopenmp", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        # Retry without OpenMP if unavailable.
        cmd = [c for c in cmd if c != "-fopenmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e2:
            raise RuntimeError(
                f"Failed to build native BA solver:\n{e.stderr}\n{e2.stderr}"
            ) from e2


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        c_double_p = ctypes.POINTER(ctypes.c_double)
        c_int_p = ctypes.POINTER(ctypes.c_int)
        for name in ("gasfm_ba_euclidean", "gasfm_ba_projective"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                c_double_p, c_double_p, c_double_p,
                c_int_p, c_int_p,
                c_double_p, c_double_p,
                ctypes.c_double, ctypes.c_int, ctypes.c_double,
                ctypes.c_int, ctypes.c_int, c_double_p,
            ]
        _lib = lib
        return _lib
