"""ctypes loader for the native BA solver, with on-demand compilation.

The C++ source (native/ba_solver.cpp) is compiled once per environment into
native/libgasfm_ba.<host>.so; subsequent imports reuse the cached binary.
The host tag in the name keys the -march=native build to this machine: a
tree shared over NFS (or rsync'd) between heterogeneous hosts must not load
a cached .so carrying another CPU's vector ISA (SIGILL on first call).
"""

from __future__ import annotations

import ctypes
import os
import platform
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "ba_solver.cpp")


def _host_tag() -> str:
    """A cheap per-host cache key for -march=native artifacts: machine arch
    plus a hash of the CPU flags line (the ISA surface -march=native keys
    on). Falls back to arch alone where /proc/cpuinfo is unavailable."""
    tag = platform.machine() or "unknown"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    import hashlib

                    h = hashlib.sha1(line.encode()).hexdigest()[:8]
                    return f"{tag}-{h}"
    except OSError:
        pass
    return tag


_SO = os.path.join(_NATIVE_DIR, f"libgasfm_ba.{_host_tag()}.so")

_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
        "-fopenmp", _SRC, "-o", _SO,
    ]
    # FileNotFoundError (no g++ on PATH) must land in the explanatory
    # RuntimeError too, not escape as a bare "No such file" traceback.
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except FileNotFoundError as e:
        raise RuntimeError(
            "Failed to build native BA solver: g++ not found on PATH "
            "(install a C++ toolchain, or pre-build native/libgasfm_ba*.so)."
        ) from e
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
