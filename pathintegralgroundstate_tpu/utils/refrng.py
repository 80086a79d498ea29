"""Reference-compatible MT19937 stream (ctypes binding to native/mtref.c).

Provides the exact random sequence of the reference Fortran program
(random_mod.f90): `sgrnd`-style 69069 seeding, `grnd` tempered doubles, and
`rangauss` polar Box-Muller.  Used by the parity tests to replay reference
trajectories, and exposed as `RefRNG` for anyone migrating workflows that
depend on the reference's seeded streams.

The C library is compiled on first use (cc -O2 -shared); a pure-Python
fallback keeps everything working without a C toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmtref.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "mtref.c")

_lib = None


def _build():
    cc = os.environ.get("CC", "cc")
    subprocess.run(
        [cc, "-O2", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH, "-lm"],
        check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)):
        _build()
    lib = ctypes.CDLL(_SO_PATH)
    lib.mtref_state_size.restype = ctypes.c_int
    lib.mtref_grnd.restype = ctypes.c_double
    lib.mtref_grnd.argtypes = [ctypes.c_void_p]
    lib.mtref_seed.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.mtref_grnd_array.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_long]
    lib.mtref_rangauss_array.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                         ctypes.c_double, ctypes.c_void_p,
                                         ctypes.c_long]
    lib.mtref_rangauss.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                   ctypes.c_double, ctypes.c_void_p,
                                   ctypes.c_void_p]
    _lib = lib
    return lib


class RefRNG:
    """Drop-in equivalent of the reference's RNG module (native backend)."""

    def __init__(self, seed: int = 1982):
        lib = _load()
        self._lib = lib
        self._st = ctypes.create_string_buffer(lib.mtref_state_size())
        lib.mtref_seed(self._st, ctypes.c_uint32(seed & 0xFFFFFFFF))

    def grnd(self) -> float:
        return self._lib.mtref_grnd(self._st)

    def uniform(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float64)
        self._lib.mtref_grnd_array(
            self._st, out.ctypes.data_as(ctypes.c_void_p), n)
        return out

    def rangauss(self, sigma: float = 1.0, mu: float = 0.0):
        x1 = ctypes.c_double()
        x2 = ctypes.c_double()
        self._lib.mtref_rangauss(self._st, sigma, mu,
                                 ctypes.byref(x1), ctypes.byref(x2))
        return x1.value, x2.value

    def gauss(self, n: int, sigma: float = 1.0, mu: float = 0.0) -> np.ndarray:
        """n draws of rangauss's x1 (the reference discards x2,
        vpi_mod.f90:515)."""
        out = np.empty(n, np.float64)
        self._lib.mtref_rangauss_array(
            self._st, sigma, mu, out.ctypes.data_as(ctypes.c_void_p), n)
        return out


class PyRefRNG:
    """Pure-Python fallback, bit-identical to RefRNG (slow)."""

    N, M = 624, 397
    MATA = 0x9908B0DF
    UMASK, LMASK = 0x80000000, 0x7FFFFFFF
    TB, TC = 0x9D2C5680, 0xEFC60000

    def __init__(self, seed: int = 1982):
        mt = np.empty(self.N, np.uint64)
        mt[0] = seed & 0xFFFFFFFF
        for i in range(1, self.N):
            mt[i] = (69069 * mt[i - 1]) & 0xFFFFFFFF
        self.mt = mt
        self.mti = self.N

    def _gen(self):
        mt, N, M = self.mt, self.N, self.M
        for kk in range(N):
            y = (mt[kk] & self.UMASK) | (mt[(kk + 1) % N] & self.LMASK)
            mt[kk] = mt[(kk + M) % N] ^ (y >> 1) ^ (self.MATA if y & 1 else 0)
        self.mti = 0

    def grnd(self) -> float:
        if self.mti >= self.N:
            self._gen()
        y = int(self.mt[self.mti])
        self.mti += 1
        y ^= y >> 11
        y = (y ^ ((y << 7) & self.TB)) & 0xFFFFFFFF
        y = (y ^ ((y << 15) & self.TC)) & 0xFFFFFFFF
        y ^= y >> 18
        return y / 4294967295.0

    def rangauss(self, sigma=1.0, mu=0.0):
        while True:
            u1 = 2.0 * self.grnd() - 1.0
            u2 = 2.0 * self.grnd() - 1.0
            w = u1 * u1 + u2 * u2
            if w <= 1.0:
                break
        w = np.sqrt(-2.0 * np.log(w) / w)
        return mu + sigma * u1 * w, mu + sigma * u2 * w
