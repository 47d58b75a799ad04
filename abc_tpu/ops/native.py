"""ctypes bindings for the native C++ modpoly engine (native/modpoly.cpp).

The shared library is built on demand with the system compiler (pybind11 is
not available in this image; ctypes keeps the binding dependency-free).
Provides the "cpp64" host engine: bit-identical to np64/jx32 but ~10-50×
faster than NumPy-with-Python-loops for the host-side key generation and
encryption paths at large n.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _locate() -> tuple:
    """(source path, shared-object path) for the current install layout.

    Dev/repo layout: <repo>/native/modpoly.cpp with the .so built next to
    it. pip-installed layout: the source ships as package data
    (abc_tpu/_native_src/modpoly.cpp, pyproject.toml) and the .so is built
    on first use into the source dir if writable, else into
    ~/.cache/abc_tpu/native (site-packages is often read-only)."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_src = os.path.join(os.path.dirname(pkg), "native", "modpoly.cpp")
    pkg_src = os.path.join(pkg, "_native_src", "modpoly.cpp")
    src = repo_src if os.path.exists(repo_src) else pkg_src
    so_dir = os.path.dirname(src)
    if not os.access(so_dir, os.W_OK):
        so_dir = os.path.join(os.path.expanduser("~"), ".cache", "abc_tpu",
                              "native")
        os.makedirs(so_dir, exist_ok=True)
    return src, os.path.join(so_dir, "libmodpoly.so")


_SRC, _SO = _locate()

_U32P = np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS")


def _build() -> None:
    base = ["-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO]
    for extra in (["-fopenmp"], []):       # prefer threaded; fall back serial
        for cc in ("g++", "cc", "gcc", "clang"):
            try:
                subprocess.run([cc] + extra + base,
                               check=True, capture_output=True)
                return
            except (subprocess.CalledProcessError, FileNotFoundError):
                continue
    raise RuntimeError("no working C compiler found for the native engine")


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.ntt_forward.argtypes = [_U32P, _U32P, _U32P, _U32P,
                                ctypes.c_int64, ctypes.c_int64]
    lib.ntt_inverse.argtypes = [_U32P, _U32P, _U32P, _U32P, _U32P, _U32P,
                                ctypes.c_int64, ctypes.c_int64]
    lib.pointwise_mul_mod.argtypes = [_U32P, _U32P, _U32P, _U32P,
                                      ctypes.c_int64, ctypes.c_int64]
    lib.add_mod_poly.argtypes = [_U32P, _U32P, _U32P, _U32P,
                                 ctypes.c_int64, ctypes.c_int64]
    lib.sub_mod_poly.argtypes = [_U32P, _U32P, _U32P, _U32P,
                                 ctypes.c_int64, ctypes.c_int64]
    lib.mul_mod_rows.argtypes = [_U32P, _U32P, _U32P, _U32P, _U32P,
                                 ctypes.c_int64, ctypes.c_int64]
    lib.ntt_forward_batch.argtypes = [_U32P, _U32P, _U32P, _U32P,
                                      ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64]
    lib.ntt_inverse_batch.argtypes = [_U32P, _U32P, _U32P, _U32P, _U32P,
                                      _U32P, ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64]
    _LIB = lib
    return lib


def mul_mod_rows(a: np.ndarray, b: np.ndarray, q: np.ndarray,
                 mu: np.ndarray) -> np.ndarray:
    """Broadcast a·b mod q over [..., n] rows via the native engine.
    a, b broadcast together; q/mu broadcast over the row dims."""
    lib = load()
    a2, b2 = np.broadcast_arrays(a, b)
    shape = a2.shape
    n = shape[-1]
    rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    q_rows = np.ascontiguousarray(
        np.broadcast_to(np.asarray(q, dtype=np.uint32).reshape(
            np.asarray(q).shape[:-1]), shape[:-1]).reshape(-1))
    mu_rows = np.ascontiguousarray(
        np.broadcast_to(np.asarray(mu, dtype=np.uint32).reshape(
            np.asarray(mu).shape[:-1]), shape[:-1]).reshape(-1))
    a2 = np.ascontiguousarray(a2, dtype=np.uint32).reshape(rows, n)
    b2 = np.ascontiguousarray(b2, dtype=np.uint32).reshape(rows, n)
    out = np.empty((rows, n), dtype=np.uint32)
    lib.mul_mod_rows(a2, b2, out, q_rows, mu_rows, rows, n)
    return out.reshape(shape)


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


class NativeNtt:
    """Native-engine counterpart of NttContext's transforms; operates on the
    SAME precomputed tables, so outputs are bit-identical."""

    def __init__(self, ntt_context):
        self.lib = load()
        self.n = ntt_context.n
        # tables as contiguous host arrays
        self.q = np.ascontiguousarray(np.asarray(ntt_context.q).reshape(-1))
        self.tw = np.ascontiguousarray(np.asarray(ntt_context.fwd_tw))
        self.twsh = np.ascontiguousarray(np.asarray(ntt_context.fwd_tw_sh))
        self.itw = np.ascontiguousarray(np.asarray(ntt_context.inv_tw))
        self.itwsh = np.ascontiguousarray(np.asarray(ntt_context.inv_tw_sh))
        self.ninv = np.ascontiguousarray(np.asarray(ntt_context.n_inv).reshape(-1))
        self.ninvsh = np.ascontiguousarray(
            np.asarray(ntt_context.n_inv_sh).reshape(-1))
        self.L = self.q.shape[0]

    def fwd(self, a: np.ndarray) -> np.ndarray:
        out = np.ascontiguousarray(a, dtype=np.uint32).copy()
        flat = out.reshape(-1, self.L, self.n)
        self.lib.ntt_forward_batch(flat, self.tw, self.twsh, self.q,
                                   flat.shape[0], self.L, self.n)
        return out

    def inv(self, a: np.ndarray) -> np.ndarray:
        out = np.ascontiguousarray(a, dtype=np.uint32).copy()
        flat = out.reshape(-1, self.L, self.n)
        self.lib.ntt_inverse_batch(flat, self.itw, self.itwsh, self.ninv,
                                   self.ninvsh, self.q,
                                   flat.shape[0], self.L, self.n)
        return out

    def pointwise_mul(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a = np.ascontiguousarray(a, dtype=np.uint32)
        b = np.ascontiguousarray(b, dtype=np.uint32)
        out = np.empty_like(a)
        fa, fb = a.reshape(-1, self.n), b.reshape(-1, self.n)
        fo = out.reshape(-1, self.n)
        reps = fa.shape[0] // self.L
        for r in range(reps):
            sl = slice(r * self.L, (r + 1) * self.L)
            self.lib.pointwise_mul_mod(np.ascontiguousarray(fa[sl]),
                                       np.ascontiguousarray(fb[sl]),
                                       fo[sl], self.q, self.L, self.n)
        return out
