"""Packed narrow-ring comparisons (cfg.mpc.compare_bits).

Arithmetic shares of a mod-2^64 secret reduce to shares of the same secret
mod 2^w for any power-of-two w (subring), so comparisons whose operand
difference fits in [-2^(w-1), 2^(w-1)) ring units can run the SPK sign
circuit in the 2^w ring: 64/w elements pack into each uint64 word and the
masked Sklansky prefix needs only log2(w) AND levels (no level-i arrow
crosses an aligned 2^(i+1) block boundary — curl_tpu/mpc/primitives/
circuit.py). Reference comparisons are always full-ring
(curl/mpc/mpc.py:233-242); this is the TPU-first replacement for the
comparison bottleneck (vocab-size max tournaments).
"""

import numpy as np
import pytest

import curl_tpu
from curl_tpu.mpc import mpc as mpc_mod
from curl_tpu.mpc.primitives import circuit

Q = 2e-4  # one fixed-point quantum at 16-bit precision, with slack


@pytest.fixture()
def rng():
    return np.random.default_rng(20260817)


@pytest.fixture(autouse=True)
def _init():
    curl_tpu.init(world_size=2, seed=5)
    yield


def _edge_values(rng):
    x = np.concatenate(
        [rng.normal(size=100) * 1000, [0.0, -0.0001, 0.0001, 16000.0, -16000.0, 7.5]]
    )
    y = np.concatenate(
        [rng.normal(size=100) * 1000, [0.0, 0.0, 0.0, -16000.0, 16000.0, 7.5]]
    )
    return x, y


@pytest.mark.parametrize("bits", [32, 64])
def test_comparison_ops_exact(rng, bits):
    x, y = _edge_values(rng)
    with curl_tpu.cfg.temp_override({"mpc.compare_bits": bits}):
        xe, ye = curl_tpu.cryptensor(x), curl_tpu.cryptensor(y)
        np.testing.assert_array_equal(xe.lt(ye).get_plain_text(), (x < y).astype(float))
        np.testing.assert_array_equal(xe.le(ye).get_plain_text(), (x <= y).astype(float))
        np.testing.assert_array_equal(xe.gt(ye).get_plain_text(), (x > y).astype(float))
        np.testing.assert_array_equal(xe.ge(ye).get_plain_text(), (x >= y).astype(float))
        np.testing.assert_array_equal(xe.eq(ye).get_plain_text(), (x == y).astype(float))
        np.testing.assert_array_equal(xe.ne(ye).get_plain_text(), (x != y).astype(float))


def test_compare_16bit_small_values(rng):
    # 16-bit envelope at precision 16 is |diff| < 0.5 decoded
    x = rng.uniform(-0.2, 0.2, size=64)
    y = rng.uniform(-0.2, 0.2, size=64)
    with curl_tpu.cfg.temp_override({"mpc.compare_bits": 16}):
        got = curl_tpu.cryptensor(x).lt(curl_tpu.cryptensor(y)).get_plain_text()
    np.testing.assert_array_equal(got, (x < y).astype(float))


def test_packed_odd_sizes_and_scalars(rng):
    with curl_tpu.cfg.temp_override({"mpc.compare_bits": 32}):
        v = rng.normal(size=(3, 5, 7))
        np.testing.assert_array_equal(
            curl_tpu.cryptensor(v).lt(0).get_plain_text(), (v < 0).astype(float)
        )
        s = curl_tpu.cryptensor(np.float64(-2.5))
        assert float(s.lt(0).get_plain_text()) == 1.0
        s2 = curl_tpu.cryptensor(np.float64(2.5))
        assert float(s2.lt(0).get_plain_text()) == 0.0


@pytest.mark.parametrize(
    "ws,proto,prov",
    [(3, "beaver", "TFP"), (3, "replicated", "TFP"), (2, "beaver", "TTP")],
)
def test_packed_compare_protocol_matrix(rng, ws, proto, prov):
    curl_tpu.init(world_size=ws, seed=7)
    x = np.concatenate([rng.normal(size=50) * 1000, [0.0, 5000.0, -5000.0]])
    y = np.concatenate([rng.normal(size=50) * 1000, [0.0, -5000.0, 5000.0]])
    with curl_tpu.cfg.temp_override(
        {"mpc.compare_bits": 32, "mpc.protocol": proto, "mpc.provider": prov}
    ):
        xe, ye = curl_tpu.cryptensor(x), curl_tpu.cryptensor(y)
        np.testing.assert_array_equal(xe.lt(ye).get_plain_text(), (x < y).astype(float))
        np.testing.assert_array_equal(xe.eq(ye).get_plain_text(), (x == y).astype(float))
        np.testing.assert_array_equal(xe.ne(ye).get_plain_text(), (x != y).astype(float))


@pytest.mark.parametrize("width", [16, 32])
def test_packed_adder_unit(rng, width):
    """circuit.add(width=w) == 64/w independent w-bit adders on packed words
    (including for chained adds: the boundary carry is cleared)."""
    from curl_tpu.mpc.primitives.binary import BinarySharedTensor
    from curl_tpu.parallel.runner import compile_parties

    lanes = 64 // width
    maskw = (1 << width) - 1
    a = rng.integers(0, 1 << 63, size=(8,), dtype=np.uint64)
    b = rng.integers(0, 1 << 63, size=(8,), dtype=np.uint64)
    # force carry-out at segment boundaries in some lanes
    a[0] = np.uint64((maskw << (64 - width)) | maskw)
    b[0] = np.uint64((1 << (64 - width)) | 1)

    def step():
        x = BinarySharedTensor.encrypt(a, src=0)
        y = BinarySharedTensor.encrypt(b, src=1)
        return circuit.add(x, y, width=width).reveal()

    import jax

    got = np.asarray(compile_parties(step, 2)(jax.random.PRNGKey(0)))[0]
    want = np.zeros_like(a)
    for lane in range(lanes):
        sa = (a >> np.uint64(lane * width)) & np.uint64(maskw)
        sb = (b >> np.uint64(lane * width)) & np.uint64(maskw)
        want |= ((sa + sb) & np.uint64(maskw)) << np.uint64(lane * width)
    np.testing.assert_array_equal(got, want)


def test_pack_unpack_roundtrip(rng):
    for width in (16, 32):
        for shape in ((7,), (3, 5), (), (2, 2, 3)):
            s = rng.integers(0, 1 << 63, size=shape, dtype=np.uint64)
            packed, meta = mpc_mod._pack_narrow(s, width)
            for bit in (0, width - 1):
                got = np.asarray(mpc_mod._unpack_lanes(packed, width, meta, bit))
                want = (s >> np.uint64(bit)) & np.uint64(1)
                np.testing.assert_array_equal(got, want)


def test_scan_reduction_pad_respects_compare_ring(rng):
    """Non-power-of-two reduce axis: the pad sentinel must stay inside the
    32-bit comparison envelope AND lose to every in-envelope input."""
    v = rng.normal(size=(4, 77)) * 100 - 3000.0  # all well above -8192
    with curl_tpu.cfg.temp_override(
        {
            "mpc.compare_bits": 32,
            "functions.max_method": "scan_reduction",
            "functions.scan_fixed_width": 32,
        }
    ):
        got = curl_tpu.cryptensor(v).max(-1)[0].get_plain_text()
    np.testing.assert_allclose(got, v.max(-1), atol=Q)


def test_max_parity_32_vs_64(rng):
    v = rng.normal(size=(2, 33)) * 50
    outs = {}
    for bits in (32, 64):
        with curl_tpu.cfg.temp_override(
            {"mpc.compare_bits": bits, "functions.max_method": "log_reduction"}
        ):
            outs[bits] = curl_tpu.cryptensor(v).max(-1)[0].get_plain_text()
    np.testing.assert_allclose(outs[32], outs[64], atol=Q)
    np.testing.assert_allclose(outs[32], v.max(-1), atol=Q)
