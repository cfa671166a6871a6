"""Native (C) runtime components, built on first import with cc.

The reference's host runtime is C++ throughout; here the Python layer
orchestrates JAX while the serial per-sample hot paths (codecs) stay
native.  Build artifacts land in the package directory; a missing
compiler degrades gracefully to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name: str) -> str | None:
    src = os.path.join(_DIR, f"{name}.c")
    so = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", so, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=60)
        return so
    except Exception:
        return None


_so_path = _build("adpcm")
_lib = ctypes.CDLL(_so_path) if _so_path else None

if _lib is not None:
    import numpy as np

    _lib.adpcm_encode.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    _lib.adpcm_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int16),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]

    class adpcm_native:  # noqa: N801 — module-like facade
        @staticmethod
        def encode(samples, state):
            samples = np.ascontiguousarray(samples, np.int16)
            out = np.zeros(len(samples) // 2, np.uint8)
            st = np.array([state.predictor, state.index], np.int32)
            _lib.adpcm_encode(
                samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(samples),
                st.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            state.predictor, state.index = int(st[0]), int(st[1])
            return out

        @staticmethod
        def decode(data, state):
            data = np.ascontiguousarray(data, np.uint8)
            out = np.zeros(len(data) * 2, np.int16)
            st = np.array([state.predictor, state.index], np.int32)
            _lib.adpcm_decode(
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                len(out),
                st.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            state.predictor, state.index = int(st[0]), int(st[1])
            return out
else:  # pragma: no cover — no compiler available
    adpcm_native = None
