"""Lazy build + load of the native env engine shared library."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None

_SRC = pathlib.Path(__file__).parent / "envengine.cpp"


def _build_dir() -> pathlib.Path:
    d = pathlib.Path(__file__).parent / "_build"
    d.mkdir(exist_ok=True)
    return d


def build_library(force: bool = False) -> pathlib.Path:
    """Compiles envengine.cpp to a shared library (cached by mtime)."""
    out = _build_dir() / "libenvengine.so"
    if out.exists() and not force and out.stat().st_mtime >= _SRC.stat().st_mtime:
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(_SRC), "-o", str(out),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load_library() -> ctypes.CDLL:
    """Builds (if needed) and loads the engine with typed signatures."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        path = build_library()
        lib = ctypes.CDLL(str(path))
        c = ctypes
        lib.engine_create.restype = c.c_void_p
        lib.engine_create.argtypes = [
            c.c_int, c.c_int, c.c_int, c.c_int, c.c_uint64, c.c_int,
        ]
        lib.engine_destroy.argtypes = [c.c_void_p]
        for fn in ("engine_obs_dim", "engine_act_dim", "engine_n_actions"):
            getattr(lib, fn).restype = c.c_int
            getattr(lib, fn).argtypes = [c.c_void_p]
        fp = c.POINTER(c.c_float)
        u8p = c.POINTER(c.c_uint8)
        i32p = c.POINTER(c.c_int32)
        lib.engine_reset.argtypes = [c.c_void_p, fp]
        lib.engine_step.argtypes = [
            c.c_void_p, fp, fp, fp, fp, u8p, u8p, fp, i32p,
        ]
        _LIB = lib
        return _LIB
