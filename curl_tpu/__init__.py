"""curl_tpu — a TPU-native secure multi-party computation framework.

From-scratch rebuild of the capabilities of Curl (jimouris/curl: CrypTen +
wavelet-LUT nonlinearities) designed for JAX/XLA on TPU:

  * shares are uint64 jax arrays; 64-bit ring matmuls run as one int8 MXU
    pass via balanced-limb decomposition (curl_tpu.ring)
  * the MPC party is a named mesh axis: vmap for simulation, shard_map for
    real chips; reveals are XLA collectives over ICI (curl_tpu.comm)
  * protocols are functional and jit-compile end-to-end into single XLA
    programs (curl_tpu.mpc)
  * Curl's DWT lookup-table nonlinearities are reproduced exactly, with the
    gather restructured to touch only public tables (curl_tpu.functions)

Two ways to use it:

  eager (reference-parity API):
      curl_tpu.init(world_size=2, seed=0)
      x = curl_tpu.cryptensor([1.0, -2.0])
      y = x.gelu()
      y.get_plain_text()

  compiled (the TPU fast path):
      step = curl_tpu.compile_parties(protocol_fn, world_size=2)
      out_shares = step(seed, *stacked_inputs)
"""

from __future__ import annotations

import logging

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# allow forcing a platform (e.g. CURL_TPU_PLATFORM=cpu for host-only runs)
if _os.environ.get("CURL_TPU_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["CURL_TPU_PLATFORM"])

# Persistent XLA compilation cache: MPC protocol graphs are deep (every
# sequential round adds compile time) but highly repetitive across runs.
_cache_dir = _os.environ.get(
    "CURL_TPU_COMPILE_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "curl_tpu", "xla"),
)
if _cache_dir and _cache_dir != "0":
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from .config import cfg  # noqa: E402
from . import comm  # noqa: E402
from . import ring  # noqa: E402
from . import random as _rng  # noqa: E402
from .encoder import FixedPointEncoder  # noqa: E402
from .parallel import (  # noqa: E402
    Public,
    compile_parties,
    compile_parties_cached,
    mpc_context,
    run_parties,
)
from .mpc import MPCTensor, get_default_provider  # noqa: E402
from .mpc.ptype import ptype  # noqa: E402
from . import functions  # noqa: E402  (patches ops onto MPCTensor)
from .autograd import enable_grad, is_grad_enabled, no_grad  # noqa: E402
from . import lazy as _lazy  # noqa: E402
from .lazy import lazy  # noqa: E402

__version__ = "0.1.0"

# ---------------------------------------------------------------------------
# Session state for the eager API
# ---------------------------------------------------------------------------

class _Session:
    def __init__(self):
        self.initialized = False
        self.world_size = 1
        self.keys = None
        self.counter = 0


_session = _Session()


def init(config_file=None, world_size: int = 2, seed: int = 0, device=None):
    """Initialize the eager runtime (reference: curl/__init__.py:45).

    Loads the config, derives the correlated party key streams (the
    TPU-native analogue of the PRNG seed ring-exchange), and eagerly builds
    the lookup tables.
    """
    if config_file is not None:
        cfg.load_config(config_file)
    _session.world_size = world_size
    _session.keys = _rng.make_party_keys(seed, world_size)
    _session.counter = 0
    _rng.reset_count()  # same seed + same ops => same protocol randomness
    # weight-init streams restart too: init() fully determines every later
    # model's random parameters (torch.manual_seed semantics). Without
    # this the GLOBAL init counter made weights depend on how many models
    # any EARLIER code had built — observed as order-dependent LUT-range
    # flakes in weight-sensitive tests.
    from .nn import module as _nn_module

    _nn_module._init_counter[0] = 0
    _session.initialized = True
    from .functions.luts import LookupTables

    LookupTables()  # eager LUT construction, like reference __init__.py:82
    return _session


def uninit():
    _session.initialized = False
    _session.keys = None


def is_initialized():
    return _session.initialized


def _require_init():
    if not _session.initialized:
        raise RuntimeError("curl_tpu.init() must be called first")


def _fresh_keys():
    _session.counter += 1
    c = _session.counter
    return jax.tree_util.tree_map(
        lambda k: jax.vmap(lambda kk: jax.random.fold_in(kk, c))(k), _session.keys
    )


def _eager_run(fn, *args, _jit=False):
    """Run a per-party protocol fn eagerly over the session's party axis.

    args: CrypTensor (stacked shares, vmapped) or anything else (public,
    broadcast). Returns CrypTensor-wrapped outputs.

    Inside a ``with curl_tpu.lazy():`` scope, ops are RECORDED (abstract
    shape-eval only, no device dispatch) and the whole graph executes as one
    fused jitted program at first materialization — the TPU answer to
    per-op eager dispatch round-tripping the host<->device tunnel (~30 ms
    per op on the remote platform). ``_jit=True`` is that flush path.
    """
    _require_init()
    if _lazy._tape is not None:
        recorded = _lazy._tape.record(fn, args)
        if recorded is not _lazy.FALLBACK:
            return recorded
    keys = _fresh_keys()
    vals, in_axes = [], []
    for a in args:
        if isinstance(a, CrypTensor):
            vals.append(a.mpc)
            in_axes.append(0)
        else:
            vals.append(a)
            in_axes.append(None)

    ws = _session.world_size
    provider = get_default_provider()
    host_cache = provider._active_cache

    if host_cache is None:
        def party_fn(party_keys, *inner):
            with mpc_context(party_keys, ws):
                return fn(*inner)

        mapped = jax.vmap(
            party_fn, in_axes=(0,) + tuple(in_axes), axis_name=comm.PARTY_AXIS
        )
        if _jit:
            mapped = jax.jit(mapped)
        out = mapped(keys, *vals)
    else:
        from .mpc.provider.provider import TupleCache

        # Serve from the host cache's current cursor and advance it by however
        # many entries this op's trace consumes. Re-serving from index 0 on
        # every op would reuse Beaver masks across different secrets (leaking
        # x1-x2 / y1-y2 to all parties) whenever shapes happen to line up.
        remaining = host_cache.entries[host_cache.cursor:]
        consumed = [0]

        def party_fn(party_keys, cache_entries, *inner):
            with mpc_context(party_keys, ws):
                view = TupleCache(list(cache_entries))
                provider.attach_serving_cache(view)
                try:
                    return fn(*inner)
                finally:
                    consumed[0] = view.cursor
                    provider.attach_serving_cache(None)

        mapped = jax.vmap(
            party_fn, in_axes=(0, 0) + tuple(in_axes), axis_name=comm.PARTY_AXIS
        )
        if _jit:
            mapped = jax.jit(mapped)
        out = mapped(keys, remaining, *vals)
        host_cache.cursor += consumed[0]
    return jax.tree_util.tree_map(
        _wrap_out, out, is_leaf=lambda x: isinstance(x, MPCTensor)
    )


def _wrap_out(x):
    return CrypTensor(x) if isinstance(x, MPCTensor) else x


# ---------------------------------------------------------------------------
# CrypTensor: eager stacked-share facade (reference cryptensor.py surface)
# ---------------------------------------------------------------------------

_PROPERTY_METHODS = {"size", "dim", "nelement", "numel"}


class CrypTensor:
    """Eager encrypted tensor: wraps a party-stacked MPCTensor.

    Every method call vmaps the corresponding MPCTensor protocol over the
    session's simulated parties. For performance-critical code, trace whole
    programs with curl_tpu.compile_parties instead.
    """

    def __init__(self, mpc: MPCTensor):
        self._mpc = mpc
        self._abs = None        # abstract MPCTensor (lazy-pending only)
        self._tape = None       # owning lazy.Tape while pending
        self._node_idx = None
        self._leaf_idx = None
        self.requires_grad = False
        self.grad = None
        self.grad_fn = None

    @classmethod
    def _pending(cls, abs_mpc, tape, node_idx, leaf_idx):
        """Placeholder for a lazily-recorded op output (curl_tpu.lazy):
        shape/ptype queries are served from the abstract value; .mpc access
        flushes the tape."""
        t = cls.__new__(cls)
        t._mpc = None
        t._abs = abs_mpc
        t._tape = tape
        t._node_idx = node_idx
        t._leaf_idx = leaf_idx
        t.requires_grad = False
        t.grad = None
        t.grad_fn = None
        return t

    @property
    def mpc(self) -> MPCTensor:
        if self._mpc is None:
            self._tape.flush()
            assert self._mpc is not None, "lazy flush did not fill this tensor"
        return self._mpc

    @mpc.setter
    def mpc(self, value):
        self._mpc = value
        self._tape = None

    # -- structure (host-side, no protocol) --------------------------------
    @property
    def shape(self):
        src = self._mpc if self._mpc is not None else self._abs
        return src.shape[1:]  # drop party dim

    @property
    def ndim(self):
        src = self._mpc if self._mpc is not None else self._abs
        return src.ndim - 1

    def size(self, dim=None):
        return self.shape if dim is None else self.shape[dim]

    def dim(self):
        return self.ndim

    def nelement(self):
        return int(np.prod(self.shape)) if self.shape else 1

    numel = nelement

    @property
    def share(self):
        return self.mpc.share

    @property
    def encoder(self):
        src = self._mpc if self._mpc is not None else self._abs
        return src.encoder

    @property
    def ptype(self):
        src = self._mpc if self._mpc is not None else self._abs
        return src.ptype

    def __repr__(self):
        state = "" if self._mpc is not None else ", pending"
        return f"CrypTensor(shape={self.shape}, ptype={self.ptype}{state})"

    def __len__(self):
        return self.shape[0]

    # -- reveal ------------------------------------------------------------
    def get_plain_text(self):
        shares = np.asarray(self.mpc.share)
        if self.mpc.ptype == ptype.binary:
            out = shares[0]
            for i in range(1, shares.shape[0]):
                out = out ^ shares[i]
            return out
        total = shares.sum(axis=0, dtype=np.uint64)
        return self.mpc.encoder.decode(total)

    def reveal(self):
        shares = np.asarray(self.mpc.share)
        return shares.sum(axis=0, dtype=np.uint64)

    # -- generic protocol dispatch ----------------------------------------
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        target = getattr(MPCTensor, name, None)
        if target is None or not callable(target):
            raise AttributeError(f"MPCTensor has no method {name}")

        from . import autograd as _ag

        def method(*args, **kwargs):
            # eager autograd: tape lives at the CrypTensor level so it
            # survives across per-op vmap dispatches
            if (
                name in _ag.FUNCTION_REGISTRY
                and _ag.is_grad_enabled()
                and (
                    getattr(self, "requires_grad", False)
                    or any(
                        getattr(a, "requires_grad", False)
                        for a in args
                        if isinstance(a, CrypTensor)
                    )
                )
            ):
                return _ag.apply_function(name, self, *args, **kwargs)

            def fn(mpc_self, *inner):
                return getattr(mpc_self, name)(*inner, **kwargs)

            return _eager_run(fn, self, *args)

        return method

    def __getitem__(self, idx):
        from . import autograd as _ag

        if _ag.is_grad_enabled() and getattr(self, "requires_grad", False):
            return _ag.apply_function("getitem", self, idx)
        return _eager_run(lambda m: m[idx], self)

    # -- operators ---------------------------------------------------------
    def __add__(self, y):
        return self.add(y)

    __radd__ = __add__

    def __sub__(self, y):
        return self.sub(y)

    def __rsub__(self, y):
        from . import autograd as _ag

        if _ag.is_grad_enabled() and getattr(self, "requires_grad", False):
            return _ag.apply_function("__rsub__", self, y)
        return _eager_run(lambda m, yy: m.neg().add(yy), self, y)

    def __rtruediv__(self, y):
        from . import autograd as _ag

        if _ag.is_grad_enabled() and getattr(self, "requires_grad", False):
            return _ag.apply_function("__rtruediv__", self, y)
        return _eager_run(lambda m, yy: m.reciprocal().mul(yy), self, y)

    def __mul__(self, y):
        return self.mul(y)

    __rmul__ = __mul__

    def __matmul__(self, y):
        return self.matmul(y)

    def __truediv__(self, y):
        return self.div(y)

    def __neg__(self):
        return self.neg()

    def __mod__(self, y):
        return self.mod(y)

    # binary-ptype bitwise ops (no autograd; eager passthrough to MPCTensor)
    def __xor__(self, y):
        return _eager_run(lambda m, yy: m ^ yy, self, y)

    def __and__(self, y):
        return _eager_run(lambda m, yy: m & yy, self, y)

    def __or__(self, y):
        return _eager_run(lambda m, yy: m | yy, self, y)

    def __invert__(self):
        return _eager_run(lambda m: ~m, self)

    def __lshift__(self, bits):
        return _eager_run(lambda m: m << bits, self)

    def __rshift__(self, bits):
        return _eager_run(lambda m: m >> bits, self)

    def __lt__(self, y):
        return self.lt(y)

    def __le__(self, y):
        return self.le(y)

    def __gt__(self, y):
        return self.gt(y)

    def __ge__(self, y):
        return self.ge(y)

    def __eq__(self, y):  # noqa: A003 - parity with reference semantics
        return self.eq(y)

    def __ne__(self, y):
        return self.ne(y)

    __hash__ = None


def cryptensor(value, src: int = 0, precision=None, ptype_=ptype.arithmetic,
               requires_grad: bool = False):
    """Encrypt a plaintext into a CrypTensor (reference curl/__init__.py:146;
    requires_grad marks the result as an autograd leaf, as in the reference's
    CrypTensor constructor)."""
    _require_init()
    value = jnp.asarray(value)

    def fn(v):
        return MPCTensor.encrypt(v, src=src, precision=precision, ptype=ptype_)

    out = _eager_run(fn, value)
    if requires_grad:
        out.requires_grad = True
    return out


def is_encrypted_tensor(obj) -> bool:
    return isinstance(obj, (CrypTensor, MPCTensor))


def cat(tensors, dim=0):
    enc = [t for t in tensors if isinstance(t, CrypTensor)]
    if not enc:
        return jnp.concatenate(tensors, axis=dim)
    tensors = [t if isinstance(t, CrypTensor) else cryptensor(t) for t in tensors]
    from . import autograd as _ag

    if _ag.is_grad_enabled() and any(
        getattr(t, "requires_grad", False) for t in tensors
    ):
        return _ag.apply_function("cat", tensors, dim)
    return _eager_run(lambda *ms: MPCTensor.cat(list(ms), axis=dim), *tensors)


def stack(tensors, dim=0):
    enc = [t for t in tensors if isinstance(t, CrypTensor)]
    if not enc:
        return jnp.stack(tensors, axis=dim)
    tensors = [t if isinstance(t, CrypTensor) else cryptensor(t) for t in tensors]
    from . import autograd as _ag

    if _ag.is_grad_enabled() and any(
        getattr(t, "requires_grad", False) for t in tensors
    ):
        return _ag.apply_function("stack", tensors, dim)
    return _eager_run(lambda *ms: MPCTensor.stack(list(ms), axis=dim), *tensors)


def where(condition, x, y):
    if is_encrypted_tensor(condition):
        return condition.mul(x).add(condition.neg().add(1).mul(y))
    cond = jnp.asarray(condition).astype(jnp.float64)
    if is_encrypted_tensor(x):
        return x.mul(cond).add(y.mul(1 - cond) if is_encrypted_tensor(y) else jnp.asarray(y) * (1 - cond))
    return jnp.where(condition, x, y)


def rand(*sizes):
    """Private uniform [0,1) samples (reference curl/__init__.py:470)."""
    _require_init()
    if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
        sizes = tuple(sizes[0])
    return _eager_run(lambda: MPCTensor.rand(*sizes))


def randn(*sizes):
    _require_init()
    if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
        sizes = tuple(sizes[0])
    return _eager_run(lambda: MPCTensor.randn(*sizes))


def bernoulli(tensor):
    return rand(*np.shape(tensor)).lt(tensor)


# ---------------------------------------------------------------------------
# Save / load (reference curl/__init__.py:288-436)
# ---------------------------------------------------------------------------

def save_from_party(obj, path, src: int = 0):
    """Party `src` persists a plaintext object (numpy .npy)."""
    if isinstance(obj, CrypTensor):
        raise NotImplementedError("saving encrypted tensors is not supported")
    np.save(path, np.asarray(obj))


def load_from_party(path, src: int = 0, **kwargs):
    """Load a plaintext at party `src` and share it."""
    value = np.load(path)
    return cryptensor(value, src=src, **kwargs)


def save(obj, path):
    """Persist the party-stacked shares of a CrypTensor."""
    if not isinstance(obj, CrypTensor):
        raise TypeError("curl_tpu.save expects a CrypTensor")
    np.savez(
        path,
        share=np.asarray(obj.mpc.share),
        precision=obj.mpc.encoder.precision_bits,
        ptype=obj.mpc.ptype.value,
    )


def load(path):
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    from .mpc.primitives.arithmetic import ArithmeticSharedTensor
    from .mpc.primitives.binary import BinarySharedTensor

    pt = ptype(int(data["ptype"]))
    share = jnp.asarray(data["share"])
    if pt == ptype.arithmetic:
        inner = ArithmeticSharedTensor(share, FixedPointEncoder(int(data["precision"])))
    else:
        inner = BinarySharedTensor(share, FixedPointEncoder(int(data["precision"])))
    return CrypTensor(MPCTensor(inner, pt))


# ---------------------------------------------------------------------------
# Logging & comm stats (reference curl/__init__.py:516-591)
# ---------------------------------------------------------------------------

def print_communication_stats():
    comm.print_communication_stats()


def reset_communication_stats():
    comm.reset_communication_stats()


def log(*args, **kwargs):
    logging.info(*args, **kwargs)


# tuple-cache controls (reference curl/__init__.py:582-591)

def trace(tracing: bool = True):
    get_default_provider().trace(tracing)


def trace_once():
    get_default_provider().trace_once()


def fill_cache(seed=0):
    """Precompute all traced tuple requests (the offline phase)."""
    from .mpc.provider.provider import TupleCache

    provider = get_default_provider()
    _require_init()
    keys = _fresh_keys()
    ws = _session.world_size

    def party_fn(party_keys):
        with mpc_context(party_keys, ws):
            return provider.fill_cache_entries()

    entries = jax.vmap(party_fn, axis_name=comm.PARTY_AXIS)(keys)
    cache = TupleCache(entries=entries)
    provider.attach_cache(cache)
    return cache


# install autograd dispatch on the per-party MPCTensor (trace-time tape for
# compiled training steps); the eager CrypTensor routes through the registry
# in __getattr__ above
from . import gradients as _gradients  # noqa: E402

_gradients.install()
cryptensor.__doc__ = (cryptensor.__doc__ or "") + (
    "\n\nPass requires_grad=True on the returned tensor to enable autograd."
)

# subpackages (imported last: they reference the package's own surface)
from . import nn  # noqa: E402,F401
from . import optim  # noqa: E402,F401
from . import models  # noqa: E402,F401


def init_thread(rank=None, world_size: int = 2, seed: int = 0):
    """Reference-parity alias (curl/__init__.py:84): the thread-based
    in-process mode maps to the vmapped simulated-party runtime."""
    return init(world_size=world_size, seed=seed)


def print(*args, dst=0, **kwargs):  # noqa: A001 - parity with curl.print
    """Rank-aware print (reference curl/__init__.py:539): in the fused
    simulated-party runtime there is one host process, which plays the
    `dst` role."""
    import builtins

    builtins.print(*args, **kwargs)


def print_in_order(*args, **kwargs):
    import builtins

    builtins.print(*args, **kwargs)
