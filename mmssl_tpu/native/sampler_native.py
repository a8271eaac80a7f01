"""ctypes bindings + lazy build of the C++ negative sampler.

The shared library is compiled on first use with g++ -O3 (no pybind11 in
this image; plain extern-C + ctypes).  Falls back silently — callers
(``mmssl_tpu.data.sampler.NegativeSampler``) catch any exception and use the
numpy path, which implements the identical contract.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sampler.cpp")
_LIB = os.path.join(_HERE, "_sampler_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _compile() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _compile()
        lib = ctypes.CDLL(_LIB)
        lib.sampler_create.restype = ctypes.c_void_p
        lib.sampler_create.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.sampler_destroy.argtypes = [ctypes.c_void_p]
        lib.sampler_sample.restype = ctypes.c_int32
        lib.sampler_sample.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib


def _as_i32_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeSampler:
    def __init__(self, train_pad: np.ndarray, train_cnt: np.ndarray):
        self._lib = _load()
        tp = np.ascontiguousarray(train_pad, dtype=np.int32)
        tc = np.ascontiguousarray(train_cnt, dtype=np.int32)
        self._handle = self._lib.sampler_create(
            _as_i32_ptr(tp), _as_i32_ptr(tc), tp.shape[0], tp.shape[1]
        )
        if not self._handle:
            raise RuntimeError("sampler_create failed")

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.sampler_destroy(self._handle)
        except Exception:
            pass

    def sample(self, users: np.ndarray, n_items: int, rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
        users = np.ascontiguousarray(users, dtype=np.int32)
        batch = users.shape[0]
        pos = np.empty(batch, dtype=np.int32)
        neg = np.empty(batch, dtype=np.int32)
        seed = int(rng.integers(0, 2**63 - 1))
        rc = self._lib.sampler_sample(
            self._handle, _as_i32_ptr(users), batch, n_items,
            ctypes.c_uint64(seed), _as_i32_ptr(pos), _as_i32_ptr(neg),
        )
        if rc != 0:
            raise RuntimeError(f"sampler_sample failed rc={rc}")
        return pos, neg


def build(train_pad: np.ndarray, train_cnt: np.ndarray) -> NativeSampler:
    return NativeSampler(train_pad, train_cnt)
