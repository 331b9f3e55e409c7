"""Wavelet lookup-table construction (Curl's core technique), numpy-native.

Rebuild of the reference LookupTables singleton (reference:
curl/common/functions/approximations.py:36-346). The reference calls
pywt.wavedec; this environment has no pywt, so the discrete wavelet
decomposition is implemented directly from the filter banks:

  haar     dec_lo = [1, 1] / sqrt(2)
  bior2.2  dec_lo = sqrt(2) * [0, -1/8, 1/4, 3/4, 1/4, -1/8]

with pywt's 'symmetric' (half-sample) boundary extension and downsampling
grid a[k] = (h * pad(x))[2k + L].  The alignment was validated against the
reference's roll constants (-2, -3 for bior2.2): a piecewise-linear
reconstruction from the two rolled banks reproduces f to the expected
table resolution, confirming index parity with pywt.

Tables are plain int64 numpy arrays (cast to uint64 at use); they are
public constants and get baked into XLA traces. Generation is seconds of
host CPU; results are cached on disk keyed by the config values involved.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np

from ..config import cfg

SQRT2 = math.sqrt(2.0)
_FILTERS = {
    "haar": np.array([1.0, 1.0]) / SQRT2,
    "bior2.2": np.array([0.0, -0.125, 0.25, 0.75, 0.25, -0.125]) * SQRT2,
}

_CACHE_DIR = os.environ.get(
    "CURL_TPU_LUT_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "curl_tpu")
)


def dwt_approx_level(x: np.ndarray, wavelet: str) -> np.ndarray:
    """One DWT analysis level: approx coefficients only."""
    h = _FILTERS[wavelet]
    L = len(h)
    xp = np.concatenate([x[: L - 1][::-1], x, x[::-1][: L - 1]])
    c = np.convolve(xp, h, mode="full")
    out_len = (len(x) + L - 1) // 2
    return c[L : L + 2 * out_len : 2]


def wavedec_approx(x: np.ndarray, wavelet: str, level: int) -> np.ndarray:
    """Approximation coefficients after `level` analysis passes
    (equivalent to pywt.wavedec(x, wavelet, level=level)[0])."""
    if wavelet == "haar" and (len(x) & (len(x) - 1)) == 0:
        # fast path: haar approx at level d on power-of-two length is the
        # block sum scaled by 2^(-d/2)
        d = level
        blocks = x.reshape(-1, 1 << d).sum(axis=1)
        return blocks * 2.0 ** (-d / 2)
    for _ in range(level):
        x = dwt_approx_level(x, wavelet)
    return x


class LookupTables:
    """Singleton table store, rebuilt when the relevant config changes."""

    _instance = None

    def __new__(cls):
        key = cls._config_key()
        if cls._instance is not None and cls._instance._key == key:
            return cls._instance
        inst = object.__new__(cls)
        inst._key = key
        inst.LUTs = {}
        inst.initialize_luts()
        cls._instance = inst
        return inst

    @staticmethod
    def _config_key():
        f = cfg.functions.to_dict()
        items = tuple(sorted((k, str(v)) for k, v in f.items()))
        return (cfg.encoder.precision_bits,) + items

    # -- generators (reference approximations.py:63-87) --------------------
    def generate_haar(self, max_bits, lut_bits, function, name, negative_values=False):
        scale = 2 ** cfg.encoder.precision_bits
        max_element = 2 ** max_bits
        depth = max_bits + cfg.encoder.precision_bits - lut_bits
        if negative_values:
            grid = np.linspace(
                -max_element + 1 / scale, max_element, 2 * max_element * scale
            )
        else:
            grid = np.linspace(1.0 / scale, max_element, max_element * scale)
        full = function(grid)
        coeffs = wavedec_approx(full, "haar", depth)
        self.LUTs[name] = np.asarray(
            coeffs * 2.0 ** (-depth / 2) * scale
        ).astype(np.int64)

    def generate_bior(self, max_bits, lut_bits, function, name, negative_values=False):
        scale = 2 ** cfg.encoder.precision_bits
        max_element = 2 ** max_bits
        depth = max_bits + cfg.encoder.precision_bits - lut_bits
        if negative_values:
            grid = np.linspace(
                -max_element + 1 / scale, max_element, 2 * max_element * scale
            )
            size = 2 ** (lut_bits + 1)
        else:
            grid = np.linspace(1.0 / scale, max_element, max_element * scale)
            size = 2 ** lut_bits
        full = function(grid)
        coeffs = wavedec_approx(full, "bior2.2", depth)
        banks = np.stack([np.roll(coeffs, -2)[:size], np.roll(coeffs, -3)[:size]])
        self.LUTs[name] = np.asarray(banks * scale * 2.0 ** (depth * 0.5)).astype(
            np.int64
        )

    # -- table construction (reference approximations.py:90-346) -----------
    def initialize_luts(self):
        cache_file = self._cache_path()
        if cache_file and os.path.exists(cache_file):
            loaded = np.load(cache_file)
            self.LUTs = {k: loaded[k] for k in loaded.files}
            return

        sigmoid = lambda x: 1 / (1 + np.exp(-x))  # noqa: E731
        relu = lambda x: x * (x > 0)  # noqa: E731
        erf_np = np.vectorize(math.erf)
        F = cfg.functions
        prec = cfg.encoder.precision_bits
        scale = 2 ** prec
        lut_methods = ("haar", "bior", "haar-lut-only", "bior-lut-only")

        if F.exp_method in lut_methods + ("split",):
            max_element = 2 ** F.exp_lut_max_bits
            # inline exp_haar / exp_bior (approximations.py:108-122)
            depth = 1 + F.exp_lut_max_bits + prec - F.exp_haar_size_bits
            full = np.exp(
                np.linspace(-max_element, max_element - 1.0 / scale,
                            2 * max_element * scale)
            )
            coeffs = wavedec_approx(full, "haar", depth)
            self.LUTs["exp_haar"] = (coeffs * 2.0 ** (-depth / 2) * scale).astype(
                np.int64
            )
            depth = 1 + F.exp_lut_max_bits + prec - F.exp_bior_size_bits
            coeffs = wavedec_approx(full, "bior2.2", depth)
            coeffs = coeffs[: 2 ** F.exp_bior_size_bits]
            coeffs = np.stack([np.roll(coeffs, -2), np.roll(coeffs, -3)])
            self.LUTs["exp_bior"] = (coeffs * scale).astype(np.int64)
            # nexp split tables (approximations.py:124-128)
            size = F.exp_neg_lut_size
            full = np.exp(-np.linspace(1.0 / size, 1 / 2 ** 4, size))
            self.LUTs["nexp_low"] = (full * scale).astype(np.int64)
            full = np.exp(-np.linspace(1.0 * 2 ** 4 / size, 2 ** 4, size))
            self.LUTs["nexp_high"] = (full * scale).astype(np.int64)
            # nexp haar/bior (approximations.py:130-138)
            self.generate_haar(
                F.exp_lut_max_bits, F.exp_haar_size_bits,
                lambda x: np.exp(-x), "nexp_haar",
            )
            self.generate_bior(
                F.exp_lut_max_bits, F.exp_bior_size_bits,
                lambda x: np.exp(-x), "nexp_bior",
            )

        if F.log_method in lut_methods:
            self.generate_haar(F.log_lut_max_bits, F.log_haar_size_bits, np.log, "log_haar")
            self.generate_bior(F.log_lut_max_bits, F.log_bior_size_bits, np.log, "log_bior")

        if F.reciprocal_method in lut_methods:
            self.generate_haar(
                F.reciprocal_lut_max_bits, F.reciprocal_haar_size_bits,
                np.reciprocal, "reciprocal_haar",
            )
            self.generate_bior(
                F.reciprocal_lut_max_bits, F.reciprocal_bior_size_bits,
                np.reciprocal, "reciprocal_bior",
            )

        if F.sqrt_method in lut_methods:
            self.generate_haar(F.sqrt_lut_max_bits, F.sqrt_haar_size_bits, np.sqrt, "sqrt_haar")
            self.generate_bior(F.sqrt_lut_max_bits, F.sqrt_bior_size_bits, np.sqrt, "sqrt_bior")

        if F.inv_sqrt_method in lut_methods + ("tailored_haar",):
            inv_sqrt = lambda x: np.reciprocal(np.sqrt(x))  # noqa: E731
            self.generate_haar(
                F.inv_sqrt_lut_max_bits, F.inv_sqrt_haar_size_bits, inv_sqrt, "inv_sqrt_haar"
            )
            if "inv_sqrt_tailored_0_lut_max_bits" in F:
                self.generate_haar(
                    F.inv_sqrt_tailored_0_lut_max_bits,
                    F.inv_sqrt_tailored_0_haar_size_bits,
                    inv_sqrt, "inv_sqrt_tailored_haar_0",
                )
                self.generate_haar(
                    F.inv_sqrt_tailored_1_lut_max_bits,
                    F.inv_sqrt_tailored_1_haar_size_bits,
                    inv_sqrt, "inv_sqrt_tailored_haar_1",
                )
            self.generate_bior(
                F.inv_sqrt_lut_max_bits, F.inv_sqrt_bior_size_bits, inv_sqrt, "inv_sqrt_bior"
            )

        if F.trigonometry_method in lut_methods:
            for fname, fn in (("sin", np.sin), ("cos", np.cos)):
                periodic = (lambda g: (lambda x: g(x * np.pi * 2)))(fn)
                self.generate_haar(0, F.trigonometry_haar_size_bits, periodic, f"{fname}_haar")
                self.generate_bior(0, F.trigonometry_bior_size_bits, periodic, f"{fname}_bior")
                self.generate_haar(
                    F.trigonometry_lut_max_bits, F.trigonometry_haar_size_bits,
                    periodic, f"{fname}_haar_lut_only", negative_values=True,
                )
                self.generate_bior(
                    F.trigonometry_lut_max_bits, F.trigonometry_bior_size_bits,
                    periodic, f"{fname}_bior_lut_only", negative_values=True,
                )

        if F.sigmoid_tanh_method in lut_methods:
            self.generate_haar(
                F.sigmoid_lut_max_bits, F.sigmoid_tanh_haar_size_bits, sigmoid, "sigmoid_haar"
            )
            self.generate_bior(
                F.sigmoid_lut_max_bits, F.sigmoid_tanh_bior_size_bits, sigmoid, "sigmoid_bior"
            )
            self.generate_haar(
                F.sigmoid_lut_max_bits, F.sigmoid_tanh_haar_size_bits,
                sigmoid, "sigmoid_haar_lut_only", negative_values=True,
            )
            self.generate_bior(
                F.sigmoid_lut_max_bits, F.sigmoid_tanh_bior_size_bits,
                sigmoid, "sigmoid_bior_lut_only", negative_values=True,
            )
            self.generate_haar(
                F.tanh_lut_max_bits, F.sigmoid_tanh_haar_size_bits, np.tanh, "tanh_haar"
            )
            self.generate_bior(
                F.tanh_lut_max_bits, F.sigmoid_tanh_bior_size_bits, np.tanh, "tanh_bior"
            )
            self.generate_haar(
                F.sigmoid_lut_max_bits, F.sigmoid_tanh_haar_size_bits,
                np.tanh, "tanh_haar_lut_only", negative_values=True,
            )
            self.generate_bior(
                F.sigmoid_lut_max_bits, F.sigmoid_tanh_bior_size_bits,
                np.tanh, "tanh_bior_lut_only", negative_values=True,
            )

        if F.erf_method in lut_methods:
            self.generate_haar(F.erf_lut_max_bits, F.erf_haar_size_bits, erf_np, "erf_haar")
            self.generate_bior(F.erf_lut_max_bits, F.erf_bior_size_bits, erf_np, "erf_bior")
            self.generate_haar(
                F.erf_lut_max_bits, F.erf_haar_size_bits,
                erf_np, "erf_haar_lut_only", negative_values=True,
            )
            self.generate_bior(
                F.erf_lut_max_bits, F.erf_bior_size_bits,
                erf_np, "erf_bior_lut_only", negative_values=True,
            )

        if F.gelu_method in lut_methods:
            gelu = lambda x: x * (1 + erf_np(x / math.sqrt(2))) / 2  # noqa: E731
            self.generate_haar(
                F.gelu_lut_max_bits, F.gelu_haar_size_bits,
                lambda x: relu(x) - gelu(x), "gelu_haar",
            )
            self.generate_bior(
                F.gelu_lut_max_bits, F.gelu_bior_size_bits,
                lambda x: relu(x) - gelu(x), "gelu_bior",
            )
            self.generate_haar(
                F.gelu_lut_max_bits, F.gelu_haar_size_bits,
                gelu, "gelu_haar_lut_only", negative_values=True,
            )
            self.generate_bior(
                F.gelu_lut_max_bits, F.gelu_bior_size_bits,
                gelu, "gelu_bior_lut_only", negative_values=True,
            )

        if F.silu_method in lut_methods:
            silu = lambda x: x * sigmoid(x)  # noqa: E731
            self.generate_haar(
                F.silu_lut_max_bits, F.silu_haar_size_bits,
                lambda x: relu(x) - silu(x), "silu_haar",
            )
            self.generate_bior(
                F.silu_lut_max_bits, F.silu_bior_size_bits,
                lambda x: relu(x) - silu(x), "silu_bior",
            )
            self.generate_haar(
                F.silu_lut_max_bits, F.silu_haar_size_bits,
                silu, "silu_haar_lut_only", negative_values=True,
            )
            self.generate_bior(
                F.silu_lut_max_bits, F.silu_bior_size_bits,
                silu, "silu_bior_lut_only", negative_values=True,
            )

        if cache_file:
            os.makedirs(os.path.dirname(cache_file), exist_ok=True)
            np.savez(cache_file, **self.LUTs)

    def _cache_path(self):
        try:
            h = hashlib.md5(repr(self._key).encode()).hexdigest()[:16]
            return os.path.join(_CACHE_DIR, f"luts_{h}.npz")
        except Exception:
            return None
