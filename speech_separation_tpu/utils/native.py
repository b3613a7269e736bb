"""ctypes bindings for the native data-loading runtime (native/sepio.cpp).

The shared library is built on demand with the repo's Makefile (g++ + zlib,
no other dependencies) and cached; every entry point has a pure-Python
fallback, so the framework works identically without a compiler — the
native path just removes the Python-loop/copy overhead from the input
pipeline, which matters on TPU hosts where the CPU is the scarce resource.

Enable/disable with SEPSEP_NATIVE=1/0 (default: use it if it builds).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_library():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("SEPSEP_NATIVE", "1") == "0":
            return None
        so_path = os.path.join(_native_dir(), "libsepio.so")
        if not os.path.isfile(so_path):
            try:
                subprocess.run(["make", "-C", _native_dir()], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.sepio_load_npz_2d_transposed.restype = ctypes.c_int
        lib.sepio_load_npz_2d_transposed.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long)]
        lib.sepio_npz_members.restype = ctypes.c_int
        lib.sepio_npz_members.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                          ctypes.c_long]
        lib.sepio_read_wav_f32.restype = ctypes.c_long
        lib.sepio_read_wav_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load_library() is not None


def npz_member_names(path: str) -> list[str] | None:
    """Member names of an npz, or None if native is unavailable."""
    lib = _load_library()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(4096)
    n = lib.sepio_npz_members(path.encode(), buf, len(buf))
    if n < 0:
        raise IOError(f"sepio_npz_members({path}) failed: {n}")
    return [s for s in buf.value.decode().split("\n") if s]


def load_npz_2d_transposed(path: str, member: str, out: np.ndarray,
                           mode: int = 0, out2: np.ndarray | None = None
                           ) -> tuple[int, int]:
    """Decompress npz member (stored (rows, cols)) transposed into `out`
    ((out_rows, out_cols) float32, C-contiguous, pre-zeroed).
    mode 0: float32 copy; 1: |complex| or float32; 2: complex re->out, im->out2.
    Returns (true_rows, true_cols) of the transposed view (= (T, F))."""
    lib = _load_library()
    assert lib is not None
    assert out.dtype == np.float32 and out.flags.c_contiguous
    tr = ctypes.c_long()
    tc = ctypes.c_long()
    p2 = (out2.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
          if out2 is not None else None)
    rc = lib.sepio_load_npz_2d_transposed(
        path.encode(), member.encode(), mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), p2,
        out.shape[0], out.shape[1], ctypes.byref(tr), ctypes.byref(tc))
    if rc != 0:
        raise IOError(f"sepio_load_npz_2d_transposed({path}:{member}) -> {rc}")
    return tr.value, tc.value


def read_wav_f32(path: str) -> tuple[np.ndarray, int] | None:
    """Decode a wav to float32 mono, or None if native is unavailable."""
    lib = _load_library()
    if lib is None:
        return None
    sr = ctypes.c_int()
    n = lib.sepio_read_wav_f32(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        raise IOError(f"sepio_read_wav_f32({path}) -> {n}")
    out = np.empty(n, np.float32)
    got = lib.sepio_read_wav_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(sr))
    if got < 0:
        raise IOError(f"sepio_read_wav_f32({path}) -> {got}")
    return out[:got], sr.value
