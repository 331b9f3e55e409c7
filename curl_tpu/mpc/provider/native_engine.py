"""Native offline dealer: ctypes bindings over native/tuple_engine.cc.

Drop-in alternative to dealer.fill_standalone for the dealer host
(scripts/dealer.py --engine native). Produces party-stacked entries with
the IDENTICAL pytree structure the jax fill path emits, so the caches it
writes feed the same online serve path; only the dealer's randomness
source differs (ChaCha20 counter streams instead of the jax key tree).

Reference analogue: the TTP dealer process generates tuples with torch on
its own host (curl/mpc/provider/ttp_provider.py:256-306). Here that hot
loop — CSPRNG draws, share splitting, mod-2^64 Beaver products — is
multithreaded C++; convolution-op triples fall back to the in-repo jax
ring ops on CPU (rare on dealer hosts, and correctness-first).

Build: g++ -O3 -shared -fPIC -fopenmp (cached under ~/.cache/curl_tpu).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
_SRC = os.path.join(_REPO, "native", "tuple_engine.cc")

_lib = None


def _cache_dir():
    return os.environ.get(
        "CURL_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "curl_tpu", "native"),
    )


def build(force: bool = False) -> str:
    """Compile tuple_engine.cc to a shared library (content-hash cached)."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"tuple_engine_{digest}.so")
    if os.path.exists(out) and not force:
        return out
    os.makedirs(_cache_dir(), exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        tmp = os.path.join(td, "tuple_engine.so")
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
               _SRC, "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, out)
    return out


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build())
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.te_random_u64.argtypes = [ctypes.c_uint64, ctypes.c_uint64,
                                  ctypes.c_uint64, u64p]
    lib.te_mask_kbit.argtypes = [u64p, ctypes.c_uint64, ctypes.c_int]
    lib.te_split_additive.argtypes = [u64p, ctypes.c_uint64, ctypes.c_int,
                                      ctypes.c_uint64, ctypes.c_uint64, u64p]
    lib.te_split_xor.argtypes = lib.te_split_additive.argtypes
    lib.te_zero_planes.argtypes = [ctypes.c_uint64, ctypes.c_int,
                                   ctypes.c_uint64, ctypes.c_uint64, u64p]
    lib.te_mul_u64.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.te_matmul_u64.argtypes = [u64p, u64p, ctypes.c_uint64,
                                  ctypes.c_uint64, ctypes.c_uint64, u64p]
    lib.te_count_wraps.argtypes = [u64p, ctypes.c_int, ctypes.c_uint64, u64p]
    lib.te_one_hot.argtypes = [u64p, ctypes.c_uint64, ctypes.c_uint64, u64p]
    lib.te_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


class _Engine:
    """Stateful stream allocator over the C library for one fill run."""

    def __init__(self, seed: int, world_size: int):
        self.lib = _load()
        self.seed = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        self.ws = world_size
        self._ctr = 0

    def _stream(self) -> int:
        self._ctr += 1
        return self._ctr

    def random_u64(self, shape) -> np.ndarray:
        out = np.empty(int(np.prod(shape, dtype=np.int64)), dtype=np.uint64)
        # slot 0 of the stream's plane space (splits use slots 1..P-1)
        self.lib.te_random_u64(self.seed, self._stream() * 1000003, out.size,
                               _ptr(out))
        return out.reshape(tuple(shape))

    def random_kbit(self, shape, k: int) -> np.ndarray:
        out = self.random_u64(shape)
        if k < 64:
            flat = out.reshape(-1)
            self.lib.te_mask_kbit(_ptr(flat), flat.size, k)
        return out

    def split_additive(self, v: np.ndarray) -> np.ndarray:
        v = np.ascontiguousarray(v, dtype=np.uint64)
        out = np.empty((self.ws,) + v.shape, dtype=np.uint64)
        self.lib.te_split_additive(_ptr(v.reshape(-1)), v.size, self.ws,
                                   self.seed, self._stream(),
                                   _ptr(out.reshape(-1)))
        return out

    def split_xor(self, v: np.ndarray) -> np.ndarray:
        v = np.ascontiguousarray(v, dtype=np.uint64)
        out = np.empty((self.ws,) + v.shape, dtype=np.uint64)
        self.lib.te_split_xor(_ptr(v.reshape(-1)), v.size, self.ws,
                              self.seed, self._stream(),
                              _ptr(out.reshape(-1)))
        return out

    def zero_planes(self, shape) -> np.ndarray:
        n = int(np.prod(shape, dtype=np.int64))
        out = np.empty((self.ws, n), dtype=np.uint64)
        self.lib.te_zero_planes(n, self.ws, self.seed, self._stream(),
                                _ptr(out.reshape(-1)))
        return out.reshape((self.ws,) + tuple(shape))

    def ring_op(self, op: str, a: np.ndarray, b: np.ndarray, **kwargs):
        if op == "mul":
            return a * b  # numpy uint64 wraps mod 2^64
        if op == "matmul" and a.ndim == 2 and b.ndim == 2 and not kwargs:
            a = np.ascontiguousarray(a)
            b = np.ascontiguousarray(b)
            c = np.empty((a.shape[0], b.shape[1]), dtype=np.uint64)
            self.lib.te_matmul_u64(_ptr(a), _ptr(b), a.shape[0], a.shape[1],
                                   b.shape[1], _ptr(c))
            return c
        if op == "matmul" and not kwargs:
            return np.matmul(a, b)  # batched; numpy wraps mod 2^64
        # conv/conv_transpose (and any future op): exactness-first fallback
        # through the in-repo jax ring ops, pinned to the host CPU backend.
        import jax

        from ... import ring

        from ..primitives.beaver import _RING_OPS

        with jax.default_device(jax.devices("cpu")[0]):
            return np.asarray(_RING_OPS[op](ring.to_ring(a), ring.to_ring(b),
                                            **kwargs))

    def count_wraps(self, planes: np.ndarray) -> np.ndarray:
        planes = np.ascontiguousarray(planes, dtype=np.uint64)
        n = planes[0].size
        out = np.empty(n, dtype=np.uint64)
        self.lib.te_count_wraps(_ptr(planes.reshape(-1)), planes.shape[0], n,
                                _ptr(out))
        return out.reshape(planes.shape[1:])

    def one_hot(self, r: np.ndarray, lut_size: int) -> np.ndarray:
        r = np.ascontiguousarray(r, dtype=np.uint64)
        out = np.empty(r.shape + (lut_size,), dtype=np.uint64)
        self.lib.te_one_hot(_ptr(r.reshape(-1)), r.size, lut_size,
                            _ptr(out.reshape(-1)))
        return out


def fill_standalone_native(requests, world_size: int, seed: int):
    """Generate all `requests` natively; party-stacked entries matching the
    pytree structure of dealer.fill_standalone (leading dim = world_size on
    every leaf)."""
    from ..primitives.arithmetic import ArithmeticSharedTensor
    from ..primitives.binary import BinarySharedTensor

    eng = _Engine(seed, world_size)

    def ast(stacked):
        return ArithmeticSharedTensor.from_shares(stacked, precision=0)

    def bst(stacked):
        return BinarySharedTensor.from_shares(stacked)

    def share(v):
        return ast(eng.split_additive(np.asarray(v, dtype=np.uint64)))

    def bshare(v):
        return bst(eng.split_xor(np.asarray(v, dtype=np.uint64)))

    def gen(func, args, kwargs):
        kwargs = dict(kwargs)
        if func == "generate_additive_triple":
            size0, size1, op = args[0], args[1], args[2]
            a = eng.random_u64(size0)
            b = eng.random_u64(size1)
            c = eng.ring_op(op, a, b, **kwargs)
            return (share(a), share(b), share(c))
        if func == "square":
            r = eng.random_u64(args[0])
            return (share(r), share(r * r))
        if func == "generate_binary_triple":
            size0, size1 = args[0], args[1]
            a = eng.random_u64(size0)
            b = eng.random_u64(size1)
            shape = np.broadcast_shapes(tuple(size0), tuple(size1))
            a = np.broadcast_to(a, shape)
            b = np.broadcast_to(b, shape)
            return (bshare(a), bshare(b), bshare(a & b))
        if func == "wrap_rng":
            size = args[0]
            planes = np.stack(
                [eng.random_u64(size) for _ in range(world_size)], 0
            )
            theta = eng.count_wraps(planes)
            r = ArithmeticSharedTensor.from_shares(planes, precision=0)
            return (r, share(theta))
        if func == "B2A_rng":
            r = eng.random_kbit(args[0], 1)
            return (share(r), bshare(r))
        if func == "generate_one_hot":
            size, lut_size = args[0], args[1]
            r = eng.random_u64(size)
            r_clear = (r.view(np.int64) % np.int64(lut_size)).view(np.uint64)
            return (share(r_clear), share(eng.one_hot(r_clear, lut_size)))
        if func == "generate_lut_masks":
            size, lut_size, n_tables = args[0], args[1], args[2]
            r = eng.random_u64(size)
            r_clear = r.view(np.int64) % np.int64(lut_size)
            # per-party local plaintext plane: only rank 0's is protocol-
            # meaningful (it matches r_shares); others draw independently,
            # matching the per-party local streams of the jax fill
            r_plain = np.stack(
                [r_clear.astype(np.int32)]
                + [
                    (eng.random_u64(size).view(np.int64)
                     % np.int64(lut_size)).astype(np.int32)
                    for _ in range(world_size - 1)
                ],
                0,
            )
            r_shares = share(r_clear.view(np.uint64))
            masks = np.stack(
                [eng.zero_planes(tuple(size)) for _ in range(n_tables)], 1
            )  # (P, n_tables, *size): party axis leads, as vmap stacks it
            return (r_plain, r_shares, masks)
        if func == "egk_trunc_pr_rng":
            size, l, m = args[0], args[1], args[2]
            return (
                share(eng.random_kbit(size, l - m)),
                share(eng.random_kbit(size, m)),
                share(eng.random_kbit(size, 1)),
            )
        raise NotImplementedError(f"native engine: unknown tuple kind {func}")

    return [gen(req.func, req.args, req.kwargs) for req in requests]


def num_threads() -> Optional[int]:
    try:
        return _load().te_num_threads()
    except Exception:  # pragma: no cover - toolchain-less hosts
        return None
