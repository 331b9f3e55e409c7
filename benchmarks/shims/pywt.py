"""Minimal pywt stand-in for baseline measurement: wavedec approximation
coefficients for 'haar' and 'bior2.2' with symmetric padding, numerically
matching pywt's conventions (see curl_tpu/functions/luts.py for the
calibration notes)."""

import numpy as np

_SQRT2 = np.sqrt(2.0)
_FILTERS = {
    "haar": np.array([1.0, 1.0]) / _SQRT2,
    "bior2.2": np.array([0.0, -0.125, 0.25, 0.75, 0.25, -0.125]) * _SQRT2,
}


def _dwt_approx(x, wavelet):
    h = _FILTERS[wavelet]
    L = len(h)
    xp = np.concatenate([x[: L - 1][::-1], x, x[::-1][: L - 1]])
    c = np.convolve(xp, h, mode="full")
    out_len = (len(x) + L - 1) // 2
    return c[L : L + 2 * out_len : 2]


def wavedec(data, wavelet, level=1, mode="symmetric"):
    x = np.asarray(data, dtype=np.float64)
    for _ in range(level):
        x = _dwt_approx(x, wavelet)
    # reference code only consumes the approximation band: `coeffs, *_ = ...`
    return [x]
