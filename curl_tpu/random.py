"""Correlated PRNG streams for MPC parties, JAX-native.

The reference holds four torch Generators per party/device —
prev/next/local/global (reference: curl/__init__.py:169-267) — seeded by a
ring exchange (next seed sent to rank+1, received from rank-1) plus a
broadcast global seed. Consumption is stateful.

TPU-native design: counter-based threefry keys instead of stateful
generators. Each party carries a pytree of four base keys; every draw derives
a fresh subkey with ``jax.random.fold_in(base, trace_counter)`` where the
counter advances at *trace time* (a Python global). Uniqueness within a trace
is guaranteed by the counter; uniqueness across executions is the caller's
job — pass a fresh ``seed`` per protocol invocation (standard JAX practice).

Correlation invariants (same as the reference's):
  keys.next[i] == keys.prev[(i+1) % P]   -> PRZS telescoping sum == 0
  keys.global identical on all parties   -> shared public randomness
  keys.local unique per party            -> private randomness
"""

from __future__ import annotations

import itertools
import threading
from typing import Optional

import jax
import jax.numpy as jnp

from . import comm

GENERATOR_NAMES = ("prev", "next", "local", "global", "ttp", "dealer")

# trace-time draw counter (shared across generators; uniqueness is all that
# matters, not per-generator sequencing)
_counter = itertools.count()
_counter_lock = threading.Lock()

# per-party key pytree, bound by the runtime context (traced values)
_ctx = threading.local()


def _next_count() -> int:
    with _counter_lock:
        return next(_counter)


def reset_count():
    """Restart the trace-time draw counter (called by ``curl_tpu.init``).

    Makes a seeded session fully deterministic: same seed + same op
    sequence replays the same protocol randomness regardless of what ran
    earlier in the process (without this, gradcheck-style tests flaked on
    borderline LUT cells depending on suite order). Draw uniqueness WITHIN
    a session is still counter-guaranteed; callers needing fresh
    randomness across sessions must init with a fresh seed — which was
    already the documented contract."""
    global _counter
    with _counter_lock:
        _counter = itertools.count()


def _is_key_vector(k) -> bool:
    """True iff ``k`` is a VECTOR of PRNG keys (e.g. the (ws,) ring_all
    entry), for typed keys (new-style, dtype prng_key: any ndim >= 1) and
    legacy raw keys (uint32 key data: a single key is (2,), a vector is
    (ws, 2))."""
    dt = getattr(k, "dtype", None)
    if dt is not None and jnp.issubdtype(dt, jax.dtypes.prng_key):
        return k.ndim >= 1
    return getattr(k, "ndim", 0) >= 2


class KeyContext:
    """Binds a party's generator keys for the duration of a protocol trace."""

    def __init__(self, keys: dict):
        self.keys = keys

    def __enter__(self):
        self.prev = getattr(_ctx, "keys", None)
        _ctx.keys = self.keys
        return self

    def __exit__(self, *exc):
        _ctx.keys = self.prev


def current_keys() -> dict:
    keys = getattr(_ctx, "keys", None)
    if keys is None:
        raise RuntimeError(
            "no PRNG context bound — run protocol code under curl_tpu "
            "runtime (init()/run_parties/compile)"
        )
    return keys


def _prng_impl() -> str:
    """PRNG implementation for the correlated streams.

    threefry2x32 (default): JAX's counter-based PRF — sound under vmap
    (every party lane derives from its own key) and cryptographically
    justified for MPC masks. NOTE: "rbg" (XLA RngBitGenerator) was
    evaluated for its ~2x smaller HLO footprint but is NOT sound here —
    its batching rule loses per-lane key dependence under vmap, which
    silently breaks the PRZS correlation invariant.
    """
    from .config import cfg

    try:
        return cfg.mpc.prng_impl or "threefry2x32"
    except AttributeError:
        return "threefry2x32"


# vmap in_axes for a party-keys pytree: per-party streams carry the party
# axis; "global"/"dealer" are party-INVARIANT and (in unstacked form) pass
# through vmap unbatched — so a tuple-plaintext draw from the dealer
# stream is generated ONCE per program instead of once per lane.
# "ring_all" is the full (ws,) ring-key vector, also unbatched: PRZS draws
# each ring stream ONCE per program instead of twice (party p's "next"
# stream is party p+1's "prev" stream — per-lane draws duplicate it).
KEY_AXES = {
    "next": 0, "prev": 0, "local": 0, "ttp": 0, "global": None,
    "dealer": None, "ring_all": None,
}


def make_party_keys(seed, world_size: int, stacked: bool = True) -> dict:
    """Build stacked (P, ...) key pytree with the ring-correlation invariant.

    Host-side analogue of the reference's seed ring-exchange
    (curl/__init__.py:225-267); on a real multi-host deployment the same
    structure can be built with one ppermute at init (sync_keys_ppermute).

    ``stacked=False`` leaves the party-invariant "global"/"dealer" keys
    UNSTACKED (no leading P axis) for use with ``KEY_AXES`` as vmap
    in_axes: shared-stream draws then trace as unbatched ops, generated
    once per program instead of once per party lane.
    """
    if isinstance(seed, int):
        base = jax.random.key(seed, impl=_prng_impl())
    else:
        base = seed
    k_global, k_ring, k_local, k_ttp, k_dealer = jax.random.split(base, 5)
    ring = jax.random.split(k_ring, world_size)        # ring[i]: shared by (i, i+1)
    local = jax.random.split(k_local, world_size)
    ttp = jax.random.split(k_ttp, world_size)
    keys = {
        # party i's "next" stream is shared with party i+1's "prev" stream
        "next": ring,
        "prev": jnp.roll(ring, 1, axis=0),
        "local": local,
        # TTP provider streams: per-party dealer-shared + the dealer's own
        "ttp": ttp,
    }
    if stacked:
        keys["global"] = jnp.broadcast_to(
            k_global, (world_size,) + k_global.shape
        )
        keys["dealer"] = jnp.broadcast_to(
            k_dealer, (world_size,) + k_dealer.shape
        )
    else:
        keys["global"] = k_global
        keys["dealer"] = k_dealer
        # full ring-key vector, shared (unbatched) across lanes: lets PRZS
        # draw each ring stream once per program (_ring_all_streams)
        keys["ring_all"] = ring
    return keys


def sync_keys_ppermute(seed_local):
    """SPMD key setup: derive ring keys in-protocol via one ring pass.

    Each party derives its 'next' key locally and sends it to rank+1, which
    stores it as 'prev' — one ppermute round, mirroring _sync_seeds.
    """
    k_next, k_local, k_g = jax.random.split(seed_local, 3)
    k_prev = comm.ppermute(k_next, shift=1)
    k_global = comm.broadcast(k_g, src=0)
    return {"next": k_next, "prev": k_prev, "local": k_local, "global": k_global}


import contextlib


@contextlib.contextmanager
def fork(i):
    """Derive an independent key context from a (possibly traced) index.

    Used by scanned/looped protocol code (e.g. lax.scan over transformer
    blocks): every iteration folds the block index into all generator keys,
    so correlated streams stay correlated while tuples differ per block —
    without this, a scanned body would reuse identical Beaver masks across
    iterations, leaking differences of masked values.
    """
    keys = current_keys()

    def _fold(k):
        if _is_key_vector(k):  # (ws,) key vectors (ring_all)
            return jax.vmap(lambda kk: jax.random.fold_in(kk, i))(k)
        return jax.random.fold_in(k, i)

    forked = {name: _fold(k) for name, k in keys.items()}
    with KeyContext(forked):
        yield


def _draw_key(generator: str, count: Optional[int] = None):
    keys = current_keys()
    if count is None:
        count = _next_count()
    return jax.random.fold_in(keys[generator], count)


# Bulk draws below this many elements stay on threefry: the fixed
# (8, 128)-tile Pallas kernel would generate >= 1024 lanes anyway, and tiny
# draws contribute negligible HLO.
_PALLAS_BULK_MIN_ELEMENTS = 1024


def _bulk_rng_impl() -> str:
    """Backend for *bulk* uniform-bits generation (key derivation is always
    threefry — only the O(elements) expansion is swapped).

    "auto" (default): "rbg" under the shard_map runtime or on the TPU
      backend (either runtime), "xla" otherwise. The TPU default is rbg
      since round 4: measured 0.245 s -> 0.167 s GPT-2 forward and
      345 s -> 158 s fresh compile (tpu_queue_r4c.log), with PRZS/decode
      invariants re-validated on device (scripts/validate_rbg_tpu.py).
      CPU stays on threefry so recorded test streams are stable.
    "xla": jax.random.bits — threefry unrolled inline by XLA.
      Portable, but ~200 HLO ops per draw site dominate compile time (and
      compiler memory) for deep protocol graphs.
    "rbg": ONE XLA RngBitGenerator op per draw site, keyed by the same
      fold_in(key, count) chain (see _rbg_bits_u64). Collapses protocol
      HLO size ~4x and cuts the shard_map compile ~3-4x. XLA's stock
      RngBitGenerator vmap batching rule does NOT thread per-lane keys
      (the silent-PRZS-break documented for "rbg" in _prng_impl), so the
      vmap runtime routes through _rbg_fn's hand-written per-lane rule;
      under shard_map each party is its own program, so per-party key
      dependence is structural.
    "pallas_tpu": one hardware-PRNG Mosaic kernel per draw site
      (ops/pallas_rng.py). Streams are keyed by 64 bits derived from the
      same fold_in(key, count) chain, so every correlation invariant
      (PRZS, shared global randomness) is inherited unchanged — parties
      with equal keys get equal streams, on CPU-threefry and TPU-Pallas
      alike within a backend. Opt-in: cfg.mpc.bulk_rng.
    """
    from .config import cfg

    try:
        return cfg.mpc.bulk_rng or "auto"
    except AttributeError:
        return "auto"


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _rbg_fn(shape):
    """Shape-specialized RngBitGenerator draw with a SOUND vmap rule.

    XLA's own batching for rng_bit_generator does not thread per-lane
    states, so the rule is written here explicitly: each vmapped lane
    (= simulated party) gets its own generator op keyed by its own state —
    an unroll of world_size ops, preserving exact per-lane key dependence
    (the property PRZS correlation rests on)."""
    from jax import lax

    @jax.custom_batching.custom_vmap
    def f(state):  # (2,) uint64 -> uint64[shape]
        _, bits = lax.rng_bit_generator(
            state, shape, dtype=jnp.uint64,
            algorithm=lax.RandomAlgorithm.RNG_DEFAULT,
        )
        return bits

    @f.def_vmap
    def _rule(axis_size, in_batched, state):  # noqa: ANN001
        (sb,) = in_batched
        if not sb:
            return f(state), False  # shared state -> shared stream
        outs = [f(state[i]) for i in range(axis_size)]
        return jnp.stack(outs), True

    return f


def _rbg_bits_u64(key, count, shape):
    """Uniform uint64 bits via ONE XLA RngBitGenerator op per draw site
    (world_size ops under the party vmap — see _rbg_fn).

    State = [base key packed to one u64, draw counter]: counter-based PRNGs
    are keyed exactly this way, so the per-draw threefry fold_in disappears
    from the graph entirely (it was ~60 HLO ops x every draw site). Equal
    (key, count) gives equal streams — the only property the correlation
    invariants (PRZS, shared global randomness) rely on; distinct counts
    give independent streams. Determinism holds within a backend; all
    parties of one execution share a backend. Security posture matches the
    reference's own mask generation (torch CUDA generators are
    Philox-counter-based, reference curl/__init__.py:169-204): a
    counter-based statistical PRNG keyed per draw.
    """
    if jnp.issubdtype(getattr(key, "dtype", None), jax.dtypes.prng_key):
        kd = jax.random.key_data(key).astype(jnp.uint64)  # (2,) < 2^32
    else:  # legacy raw (2,) uint32 key
        kd = jnp.asarray(key).astype(jnp.uint64)
    packed = (kd[0] << jnp.uint64(32)) | kd[1]
    state = jnp.stack([packed, jnp.uint64(count)])
    return _rbg_fn(tuple(shape) if not isinstance(shape, tuple) else shape)(state)


def _use_rbg() -> bool:
    # "auto" selects rbg under shard_map (where per-party keys are
    # structural) and on the TPU backend under EITHER runtime — the vmap
    # runtime goes through _rbg_fn's hand-written per-lane batching rule
    # (XLA's own rule would silently break PRZS, so it is never relied
    # on). CPU-vmap stays threefry for stream stability of the test
    # suite's recorded goldens.
    impl = _bulk_rng_impl()
    if impl == "rbg":
        return True
    if impl != "auto":
        return False
    return comm.get_runtime() == "shard_map" or jax.default_backend() == "tpu"


def _bits_u64(key, shape):
    """Uniform uint64 bits from a derived key — the single bulk-draw choke
    point for the XLA-threefry and Pallas-hardware-PRNG paths. (The rbg
    path short-circuits earlier, in _draw_bits, to skip the fold_in.)"""
    import numpy as np

    impl = _bulk_rng_impl()
    n = int(np.prod(shape)) if shape else 1
    if (
        n >= _PALLAS_BULK_MIN_ELEMENTS
        and impl == "pallas_tpu"
        and jax.default_backend() == "tpu"
    ):
        from .ops import pallas_rng

        return pallas_rng.pallas_random_bits_u64(pallas_rng.seed_from_key(key), shape)
    return jax.random.bits(key, shape, dtype=jnp.uint64)


def _draw_bits(generator: str, count, shape):
    """One uniform-u64 draw from (generator stream, count): the rbg path
    keys the generator directly with (base key, count); other paths derive
    a per-draw key via threefry fold_in first."""
    if _use_rbg():
        return _rbg_bits_u64(current_keys()[generator], count, shape)
    return _bits_u64(jax.random.fold_in(current_keys()[generator], count), shape)


def dealer_stream() -> str:
    """Stream for TUPLE PLAINTEXTS (Beaver a/b, square r, one-hot r, EGK
    randomness — the values a TFP dealer knows, of which only rank 0's
    draw enters any share sum).

    Under the vmap simulated runtime the party lanes share one program, so
    drawing these from the party-invariant "dealer" stream (unbatched
    through vmap — see KEY_AXES) generates each value ONCE instead of
    once per lane; the non-rank-0 copies were computed and discarded
    before (the reference does the same wasted work per process,
    tfp_provider.py:20-31 with the per-party "local" generator). Under
    shard_map (real party separation) the per-party "local" stream is
    kept: a shared dealer stream there would hand every party the tuple
    plaintexts."""
    return "dealer" if comm.get_runtime() == "vmap" else "local"


def random_ring(shape, generator: str = "local", count: Optional[int] = None):
    """Uniform uint64 ring element (reference: rng.py:12)."""
    if count is None:
        count = _next_count()
    return _draw_bits(generator, count, shape)


def random_kbit(
    shape, bitlength: int = 64, generator: str = "local", count: Optional[int] = None
):
    """Uniform k-bit uint64 in [0, 2^bitlength) (reference: rng.py:33)."""
    if bitlength >= 64:
        return random_ring(shape, generator, count)
    if count is None:
        count = _next_count()
    bits = _draw_bits(generator, count, shape)
    return bits >> jnp.uint64(64 - bitlength)


# PRZS ring-bulk path below this many elements stays on the per-lane
# draws (the (ws,)+shape stack + per-lane gather isn't worth it for tiny
# masks).
_RING_BULK_MIN_ELEMENTS = 1 << 16


def _ring_all_streams(shape, c):
    """Draw ALL ws ring streams once (unbatched under vmap) -> list of ws
    arrays, or None when the bulk path doesn't apply.

    Per-lane PRZS draws each ring stream twice (party p's "next" is party
    p+1's "prev"); with the unstacked "ring_all" key vector the ws streams
    are generated once per program and each lane combines its two. The
    derived keys and bit streams are IDENTICAL to the per-lane path
    (same fold_in(ring[i], c) chain), so shares are bit-equal either way.
    Returned as a LIST (not a stacked array): the callers' per-lane
    combines are built from static slices, so the (ws,)+shape concat copy
    never materializes.
    """
    import numpy as np

    keys = getattr(_ctx, "keys", None)
    if keys is None or "ring_all" not in keys:
        return None
    if comm.get_runtime() != "vmap":
        return None
    n = int(np.prod(shape)) if shape else 1
    if n < _RING_BULK_MIN_ELEMENTS:
        return None
    ra = keys["ring_all"]
    ws = ra.shape[0]
    if _use_rbg():  # keep bit-identity with the per-lane rbg chain
        return [_rbg_bits_u64(ra[i], c, shape) for i in range(ws)]
    return [_bits_u64(jax.random.fold_in(ra[i], c), shape) for i in range(ws)]


# Fused PRZS/sharing kernel engages at or above this many elements
# (ops/pallas_przs.py): below it, kernel launch + seed derivation beats
# the HBM savings.
_PRZS_KERNEL_MIN_ELEMENTS = 1 << 16


def _przs_kernel_enabled(n: int) -> bool:
    """cfg.mpc.przs_kernel: "auto" (default — the fused Mosaic kernel on
    TPU; ND shapes route to the native-2-D-tiled variant, measured 3.2x
    faster than the composable reveal chain) | "pallas_tpu" (same gate,
    explicit) | null (composable XLA path; see configs/default.yaml and
    benchmarks/results/przs_kernel_ab.json)."""
    from .config import cfg

    try:
        impl = cfg.mpc.przs_kernel
    except AttributeError:
        impl = "auto"  # knob absent: same as the shipped default
    if impl not in ("auto", "pallas_tpu"):
        return False
    return (
        n >= _PRZS_KERNEL_MIN_ELEMENTS and jax.default_backend() == "tpu"
    )


def _przs_seed_pair(c):
    from .ops import pallas_przs

    keys = current_keys()
    return pallas_przs.seed_pair_from_keys(
        jax.random.fold_in(keys["prev"], c),
        jax.random.fold_in(keys["next"], c),
    )


def przs_arithmetic(shape):
    """Pseudo-random sharing of zero: prev-stream draw minus next-stream draw.

    Telescopes to zero over the party ring (reference: arithmetic.py:158-178).
    The SAME trace-time counter feeds both draws so that party i's "next"
    sample equals party i+1's "prev" sample (all parties trace one program,
    so their counter sequences agree).

    Bulk shapes on TPU run as ONE fused Mosaic kernel (ops/pallas_przs.py):
    both ring streams are generated tile-by-tile in VMEM from the hardware
    PRNG and subtracted there, so only the share itself is written to HBM
    (the XLA path materializes both streams plus the difference; measured
    16.5 ms vs a ~1-3 ms generation floor at the (768, 50257) weight
    shape). Telescoping is preserved because the kernel streams are a pure
    function of the ring seed words: party p's next seed IS party p+1's
    prev seed.

    Bulk vmap path (XLA): party p's share is streams[p-1] - streams[p]. At
    ws=2 the two lanes' shares are d and -d for ONE shared difference
    d = s1 - s0, so the per-lane work is a single fusable select over a
    party-invariant array instead of two dynamic gathers + subtract per
    lane (measured 30 ms -> 16.5 ms at the weight shape). General ws takes
    ONE gather over the precomputed diffs. All XLA variants produce
    bit-identical shares (same streams, same ring arithmetic).
    """
    import numpy as np

    c = _next_count()
    n = int(np.prod(shape)) if shape else 1
    if _przs_kernel_enabled(n):
        from .ops import pallas_przs

        return pallas_przs.pallas_przs_u64(_przs_seed_pair(c), shape)
    streams = _ring_all_streams(shape, c)
    if streams is not None:
        ws = len(streams)
        r = comm.rank_signed()
        if ws == 2:
            d = streams[1] - streams[0]  # = party 0's share
            return jnp.where(r == 0, d, jnp.uint64(0) - d)
        diffs = jnp.stack(
            [streams[(i - 1) % ws] - streams[i] for i in range(ws)]
        )
        return jnp.take(diffs, r % ws, axis=0)
    cur = random_ring(shape, "prev", c)
    nxt = random_ring(shape, "next", c)
    return cur - nxt


def przs_share(value, src: int = 0):
    """Dealer sharing of a plaintext: PRZS + rank ``src`` adds ``value``
    (tfp_provider._share_from_local semantics; reference
    curl/mpc/provider/tfp_provider.py:20-31).

    On TPU bulk shapes this is ONE fused kernel pass: stream generation,
    the subtract, and the src-rank plaintext add all happen in VMEM,
    writing only the share (measured 24 ms -> kernel at the (768, 50257)
    weight shape). ``value`` may be party-invariant under the vmap runtime
    (TFP dealer stream — read once) or per-lane (values derived from a
    revealed quantity); the kernel's batching rule handles both. Under
    shard_map each party passes its local value and only rank src's
    enters the share sum — identical semantics to the composable path."""
    import numpy as np

    shape = np.shape(value)
    n = int(np.prod(shape)) if shape else 1
    if _przs_kernel_enabled(n) and comm.get_world_size() > 1:
        from .ops import pallas_przs

        c = _next_count()
        is_src = comm.rank_signed() == src
        return pallas_przs.pallas_share_u64(
            _przs_seed_pair(c), is_src, value, shape
        )
    share = przs_arithmetic(shape)
    if comm.get_world_size() > 1:
        mask = (comm.rank_signed() == src).astype(jnp.uint64)
        return share + mask * value
    return share + value


def przs_binary(shape, bits: int = 64):
    """XOR-PRZS for binary shares (reference: binary.py:112-133).

    ws=2 bulk vmap note: prev^next is the SAME value on both lanes (XOR is
    symmetric), so the share is one party-invariant array — no per-lane
    work at all."""
    c = _next_count()
    streams = _ring_all_streams(shape, c)
    if streams is not None:
        if bits < 64:
            streams = [s >> jnp.uint64(64 - bits) for s in streams]
        ws = len(streams)
        if ws == 2:
            return streams[0] ^ streams[1]
        r = comm.rank_signed()
        diffs = jnp.stack(
            [streams[(i - 1) % ws] ^ streams[i] for i in range(ws)]
        )
        return jnp.take(diffs, r % ws, axis=0)
    cur = random_kbit(shape, bits, "prev", c)
    nxt = random_kbit(shape, bits, "next", c)
    return cur ^ nxt
