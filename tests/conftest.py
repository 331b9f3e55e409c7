"""Test configuration: virtual 8-device CPU platform, x64 enabled.

Mirrors the reference's multiprocess test harness intent
(reference: test/multiprocess_test_case.py) with the TPU-native testing
model: simulated parties via vmap on one host, plus shard_map runs over
virtual CPU devices to validate the real-SPMD code path without chips.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# keep the CPU-test compilation cache separate from the TPU cache (machine
# feature mismatch otherwise spams AOT-loader warnings)
os.environ.setdefault(
    "CURL_TPU_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "curl_tpu", "xla-cpu"),
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

import curl_tpu


@pytest.fixture(scope="session", autouse=True)
def _init_session():
    curl_tpu.init(world_size=2, seed=1234)
    yield


@pytest.fixture(scope="module", autouse=True)
def _fresh_module_session():
    """Every test FILE starts from the canonical session (seed 1234, ws 2,
    trace counter 0). Without this, a file inherits whatever session seed /
    counter state the previous file left, so protocol masks differ between
    full-suite and standalone runs — borderline LUT-tolerance tests then
    flake by ORDER (observed: onnx Div parity)."""
    curl_tpu.init(world_size=2, seed=1234)
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(2024)


def reinit(world_size=2, seed=None, config=None):
    """Re-initialize the eager session with different parameters.

    A default seed is derived from the CURRENT TEST id, not the global
    numpy RNG: the latter made session keys depend on suite order."""
    import hashlib

    if seed is None:
        tid = os.environ.get("PYTEST_CURRENT_TEST", "global")
        digest = hashlib.sha256(tid.encode()).digest()
        seed = int.from_bytes(digest[:4], "little") % (2**31 - 1)
    if config is not None:
        base = os.path.join(os.path.dirname(curl_tpu.__file__), "configs")
        curl_tpu.cfg.load_config(os.path.join(base, config))
    curl_tpu.init(world_size=world_size, seed=seed)
