"""Communication-round conformance: each protocol must cost exactly the
rounds the spec says (BASELINE.md / reference beaver.py):

  Beaver product     1 batched reveal   (beaver.py:78-87)
  square             1 reveal           (beaver.py:114)
  EGK truncation     1 reveal           (beaver.py:172-210)
  LUT evaluation     1 reveal           (beaver.py:213-247) + EGK offline idx
  binary AND         1 batched reveal   (beaver.py:336)
  B2A single bit     1 reveal           (beaver.py:358)

Counted by the trace-time collective counters in curl_tpu.comm.
"""

import numpy as np
import pytest

import curl_tpu
from curl_tpu import comm
from curl_tpu.mpc.primitives import beaver
from curl_tpu.mpc.primitives.arithmetic import ArithmeticSharedTensor
from curl_tpu.mpc.primitives.binary import BinarySharedTensor


def run_and_count(fn, *tensors):
    comm.reset_communication_stats()
    out = curl_tpu._eager_run(fn, *tensors)
    return dict(comm.comm_stats.calls), comm.comm_stats.rounds


@pytest.fixture
def xy(rng):
    x = curl_tpu.cryptensor(rng.normal(size=(4,)))
    y = curl_tpu.cryptensor(rng.normal(size=(4,)))
    return x, y


def test_beaver_mul_one_batched_reveal(xy):
    x, y = xy
    calls, rounds = run_and_count(
        lambda a, b: beaver.mul(a._tensor, b._tensor), x, y
    )
    assert calls.get("all_sum", 0) == 1, calls


def test_square_one_reveal(xy):
    x, _ = xy
    calls, _ = run_and_count(lambda a: beaver.square(a._tensor), x)
    assert calls.get("all_sum", 0) == 1, calls


def test_egk_trunc_one_reveal(xy):
    x, _ = xy
    calls, _ = run_and_count(
        lambda a: beaver.egk_trunc_pr(a._tensor, 62, 8), x
    )
    assert calls.get("all_sum", 0) == 1, calls


def test_evaluate_lut_one_reveal(xy):
    x, _ = xy
    lut = np.arange(64, dtype=np.int64)
    calls, _ = run_and_count(
        lambda a: beaver.evaluate_lut(a._tensor, lut), x
    )
    # one reveal opens (x - r) mod L; the table dot is local
    assert calls.get("all_sum", 0) == 1, calls


def test_evaluate_bior_lut_rounds(xy):
    x, _ = xy
    luts = np.stack([np.arange(64), np.arange(64) + 1]).astype(np.int64)

    def fn(a):
        scale = ArithmeticSharedTensor(a._tensor.share, a._tensor.encoder)
        return beaver.evaluate_bior_lut(a._tensor, luts, scale, 8)

    calls, _ = run_and_count(fn, x)
    # 1 shift reveal + 1 Beaver-mul reveal (interpolation) + 1 EGK reveal
    assert calls.get("all_sum", 0) == 3, calls


def test_binary_and_one_batched_reveal(rng):
    a = curl_tpu.cryptensor(rng.normal(size=(4,)))

    def fn(t):
        xb = BinarySharedTensor.encrypt(t.share, 0)
        yb = BinarySharedTensor.encrypt(t.share, 1)
        return beaver.AND(xb, yb)

    calls, _ = run_and_count(fn, a)
    assert calls.get("all_xor", 0) == 1, calls


def test_b2a_single_bit_one_reveal(rng):
    a = curl_tpu.cryptensor(rng.normal(size=(4,)))

    def fn(t):
        xb = BinarySharedTensor.encrypt(t.share & np.uint64(1), 0)
        return beaver.B2A_single_bit(xb)

    calls, _ = run_and_count(fn, a)
    assert calls.get("all_xor", 0) == 1, calls


@pytest.mark.parametrize("bits", [32, 64])
def test_ltz_round_structure(xy, bits):
    """2PC _ltz = one SPK adder (S = x&y AND + log2(w) prefix-AND levels,
    circuit.py:125-130, w = cfg.mpc.compare_bits) + the B2A single-bit
    open: 2 + log2(w) xor rounds total (8 full-ring, 7 packed-32)."""
    import math

    x, _ = xy
    with curl_tpu.cfg.temp_override({"mpc.compare_bits": bits}):
        calls, _ = run_and_count(lambda a: a._ltz(), x)
    assert calls.get("all_xor", 0) == 2 + int(math.log2(bits)), calls
    # no arithmetic reveals beyond the B2A structure
    assert calls.get("all_sum", 0) == 0, calls


def test_gelu_round_budget(xy):
    """gelu (bior default config) must stay within its constant-round budget
    regardless of tensor size — table size never enters the count."""
    x, _ = xy
    calls_small, rounds_small = run_and_count(lambda a: a.gelu(), x)
    big = curl_tpu.cryptensor(np.linspace(-2, 2, 4096))
    calls_big, rounds_big = run_and_count(lambda a: a.gelu(), big)
    assert rounds_small == rounds_big, (calls_small, calls_big)
