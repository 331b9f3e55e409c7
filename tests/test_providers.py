"""Provider & protocol variants: TTP, replicated (3PC RSS), active
security, tuple trace/cache (parity scope: reference test_mpc.py TestTTP /
TestRSS / cache tests)."""

import numpy as np
import pytest

import curl_tpu
from conftest import reinit


def enc(x, **kw):
    return curl_tpu.cryptensor(np.asarray(x, dtype=np.float64), **kw)


@pytest.fixture
def restore_cfg():
    yield
    curl_tpu.cfg.set("mpc.provider", "TFP")
    curl_tpu.cfg.set("mpc.protocol", "beaver")
    curl_tpu.cfg.set("mpc.active_security", False)
    curl_tpu.mpc.set_default_provider("TFP")
    reinit(world_size=2)


def test_ttp_provider_mul(rng, restore_cfg):
    curl_tpu.mpc.set_default_provider("TTP")
    reinit(world_size=2)
    x = rng.normal(size=(5,)) * 3
    y = rng.normal(size=(5,)) * 3
    out = (enc(x) * enc(y)).get_plain_text()
    np.testing.assert_allclose(out, x * y, atol=0.02)


def test_ttp_provider_matmul_and_lut(rng, restore_cfg):
    curl_tpu.mpc.set_default_provider("TTP")
    reinit(world_size=3)
    a = rng.normal(size=(3, 4))
    b = rng.normal(size=(4, 2))
    out = enc(a).matmul(enc(b)).get_plain_text()
    np.testing.assert_allclose(out, a @ b, atol=0.05)
    x = np.linspace(-2, 2, 9)
    got = enc(x).gelu().get_plain_text()
    import math

    ref = x * (1 + np.vectorize(math.erf)(x / math.sqrt(2))) / 2
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_replicated_protocol_3pc(rng, restore_cfg):
    curl_tpu.cfg.set("mpc.protocol", "replicated")
    reinit(world_size=3)
    x = rng.normal(size=(6,)) * 2
    y = rng.normal(size=(6,)) * 2
    np.testing.assert_allclose(
        (enc(x) * enc(y)).get_plain_text(), x * y, atol=0.05
    )
    a = rng.normal(size=(3, 4))
    b = rng.normal(size=(4, 2))
    np.testing.assert_allclose(
        enc(a).matmul(enc(b)).get_plain_text(), a @ b, atol=0.05
    )
    np.testing.assert_allclose(
        enc(x).square().get_plain_text(), x * x, atol=0.05
    )


def test_active_security_accepts_honest_triples(rng, restore_cfg):
    curl_tpu.cfg.set("mpc.active_security", True)
    reinit(world_size=2)
    x = rng.normal(size=(4,))
    y = rng.normal(size=(4,))
    out = (enc(x) * enc(y)).get_plain_text()
    np.testing.assert_allclose(out, x * y, atol=0.02)


def test_tuple_trace_and_cache(rng, restore_cfg):
    reinit(world_size=2)
    provider = curl_tpu.get_default_provider()
    provider.requests = []
    x = rng.normal(size=(4,))
    y = rng.normal(size=(4,))

    curl_tpu.trace(True)
    _ = (enc(x) * enc(y)).get_plain_text()
    curl_tpu.trace(False)
    assert len(provider.requests) >= 1
    assert any(r.func == "generate_additive_triple" for r in provider.requests)

    cache = curl_tpu.fill_cache(seed=3)
    assert len(cache.entries) == len(provider.requests)

    out = (enc(x) * enc(y)).get_plain_text()
    np.testing.assert_allclose(out, x * y, atol=0.02)
    provider.attach_cache(None)
    provider.requests = []


def test_cached_eager_ops_advance_cursor(rng, restore_cfg):
    """Successive eager ops after fill_cache must consume distinct cache
    entries (reusing entry 0's Beaver mask across secrets would leak x1-x2
    to all parties) and raise once the cache is exhausted."""
    reinit(world_size=2)
    provider = curl_tpu.get_default_provider()
    provider.requests = []
    x = rng.normal(size=(4,))
    y = rng.normal(size=(4,))
    a = rng.normal(size=(4,))
    b = rng.normal(size=(4,))

    curl_tpu.trace(True)
    _ = (enc(x) * enc(y)).get_plain_text()
    _ = (enc(a) * enc(b)).get_plain_text()
    curl_tpu.trace(False)
    n_requests = len(provider.requests)
    assert n_requests >= 2

    cache = curl_tpu.fill_cache(seed=7)
    assert cache.cursor == 0

    out1 = (enc(x) * enc(y)).get_plain_text()
    cursor_after_first = cache.cursor
    assert cursor_after_first >= 1
    out2 = (enc(a) * enc(b)).get_plain_text()
    assert cache.cursor == len(cache.entries)
    np.testing.assert_allclose(out1, x * y, atol=0.02)
    np.testing.assert_allclose(out2, a * b, atol=0.02)

    # a third op must fail loudly, not silently restart from entry 0
    with pytest.raises(RuntimeError, match="exhausted"):
        _ = (enc(x) * enc(y)).get_plain_text()

    provider.attach_cache(None)
    provider.requests = []


def test_cache_disk_roundtrip(rng, restore_cfg, tmp_path):
    """Offline-phase checkpoint: save_cache/load_cache roundtrip through the
    restricted unpickler (treedef is pickled; must stay on the allowlist)."""
    reinit(world_size=2)
    provider = curl_tpu.get_default_provider()
    provider.requests = []
    x = rng.normal(size=(4,))
    y = rng.normal(size=(4,))

    curl_tpu.trace(True)
    _ = (enc(x) * enc(y)).get_plain_text()
    curl_tpu.trace(False)
    curl_tpu.fill_cache(seed=5)

    path = str(tmp_path / "tuples.npz")
    provider.save_cache(path)
    provider.attach_cache(None)

    cache = provider.load_cache(path)
    assert cache.cursor == 0
    out = (enc(x) * enc(y)).get_plain_text()
    np.testing.assert_allclose(out, x * y, atol=0.02)

    # tampered request files must be rejected, not executed
    import pickle

    evil = tmp_path / "requests.pkl"

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    evil.write_bytes(pickle.dumps([Evil()]))
    with pytest.raises(pickle.UnpicklingError):
        provider.load_requests(str(evil))

    provider.attach_cache(None)
    provider.requests = []


@pytest.mark.parametrize("engine", ["jax", "native"])
def test_separate_dealer_process(rng, restore_cfg, tmp_path, engine):
    """Physical dealer separation: requests are recorded party-side, the
    dealer fills them in a SEPARATE PROCESS (scripts/dealer.py, its own
    seed), per-party cache files are shipped back, and the party session
    serves the online phase from them — no party ever traces the dealer's
    sampling. Reference: curl/mpc/provider/ttp_provider.py:256-306.
    Parametrized over the jax fill and the native C++ tuple engine."""
    import os
    import subprocess
    import sys

    from curl_tpu.mpc.provider import dealer

    reinit(world_size=2)
    provider = curl_tpu.get_default_provider()
    provider.requests = []
    x = rng.normal(size=(4,))
    y = rng.normal(size=(4,))

    curl_tpu.trace(True)
    _ = (enc(x) * enc(y)).get_plain_text()
    _ = enc(x).gelu().get_plain_text()
    curl_tpu.trace(False)
    assert len(provider.requests) >= 2
    reqs = str(tmp_path / "reqs.pkl")
    provider.save_requests(reqs)

    env = dict(
        os.environ,
        CURL_TPU_PLATFORM="cpu",
        CURL_TPU_COMPILE_CACHE=os.path.expanduser("~/.cache/curl_tpu/xla-cpu"),
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "dealer.py"),
         "--requests", reqs, "--world-size", "2", "--seed", "1234",
         "--engine", engine, "--out", str(tmp_path / "tuples")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    paths = [str(tmp_path / f"tuples.party{r}.npz") for r in range(2)]
    for p in paths:
        assert os.path.exists(p)

    cache = dealer.attach_party_caches(paths)
    assert cache.cursor == 0
    got_mul = (enc(x) * enc(y)).get_plain_text()
    got_gelu = enc(x).gelu().get_plain_text()
    assert cache.cursor == len(cache.entries)
    np.testing.assert_allclose(got_mul, x * y, atol=0.02)
    import math

    ref = x * (1 + np.vectorize(math.erf)(x / math.sqrt(2))) / 2
    np.testing.assert_allclose(got_gelu, ref, atol=0.05)

    # wrong-party / incomplete shipments fail loudly
    with pytest.raises(ValueError, match="duplicate|missing"):
        dealer.load_party_caches([paths[0], paths[0]])
    with pytest.raises(ValueError, match="missing"):
        dealer.load_party_caches([paths[1]])

    provider.attach_cache(None)
    provider.requests = []


def test_comm_stats_counting(rng):
    reinit(world_size=2)
    curl_tpu.reset_communication_stats()
    x = enc(rng.normal(size=(4,)))
    y = enc(rng.normal(size=(4,)))
    _ = (x * y).get_plain_text()
    stats = curl_tpu.comm.comm_stats
    assert stats.rounds >= 1
    assert stats.bytes > 0
    assert "all_sum" in stats.calls
