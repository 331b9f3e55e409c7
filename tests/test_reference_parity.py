"""Cross-framework parity: curl_tpu outputs vs golden outputs captured from
the ACTUAL reference framework (jimouris/curl run 2-party on this host via
benchmarks/make_golden.py) under the same default.yaml config.

Shares are PRNG-dependent so raw shares differ; the contract is that
DECODED results agree to within the approximation method's own noise
(identical wavelet tables + EGK probabilistic truncation jitter).
"""

import os

import numpy as np
import pytest

import curl_tpu

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_outputs.npz")

# per-function agreement tolerance: LUT step width + EGK truncation jitter
# one LUT-cell step each: EGK probabilistic truncation rounds the cell
# index independently in the two frameworks, so results may differ by at
# most one table cell at cell boundaries
TOLS = {
    "gelu": 0.06,
    "silu": 0.04,
    "erf": 0.02,
    "sigmoid": 0.08,     # haar cell 0.25 x max slope 0.25
    "tanh": 0.15,        # haar cell 0.125 x max slope 1
    "relu": 0.01,
    "sqrt": 0.3,         # coarse 2.0-wide cells at domain edges
    "inv_sqrt": 0.05,
    "reciprocal": 0.05,
    "log": 0.05,
    "exp": 0.05,
    "softmax": 0.04,
}


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden file missing")
def test_parity_with_reference():
    data = np.load(GOLDEN, allow_pickle=True)
    names = [str(n) for n in data["_names"]]
    domains = data["_inputs"]
    n = int(data["_n"][0])

    failures = {}
    for name, (lo, hi) in zip(names, domains):
        xs = np.linspace(lo, hi, n)
        enc = curl_tpu.cryptensor(xs)
        if name == "softmax":
            # parity mode: the golden file captures the reference's RAW LUT
            # denominator reciprocal; our default adds Newton refinement
            # (more accurate than the reference — see test_functions.py
            # softmax-accuracy test), which is exactly the deviation this
            # table-math parity check must not measure.
            with curl_tpu.cfg.temp_override(
                {"functions.softmax_recip_refine": 0}
            ):
                got = (
                    enc.reshape(4, 16).softmax(-1).get_plain_text().reshape(-1)
                )
        else:
            got = getattr(enc, name)().get_plain_text()
        ref = data[name]
        err = np.abs(got - ref)
        # ignore the outermost samples (boundary-cell pollution differs only
        # by PRNG jitter but can be large in magnitude for coarse tables)
        interior = err[2:-2]
        if interior.max() > TOLS[name]:
            failures[name] = float(interior.max())
    assert not failures, f"parity failures vs reference: {failures}"
