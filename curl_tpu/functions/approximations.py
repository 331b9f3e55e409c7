"""Nonlinear functions over MPC: wavelet-LUT methods + iterative fallbacks.

Rebuild of the reference approximations module (reference:
curl/common/functions/approximations.py:349-1188). Every function follows
the same uniform pattern as the reference:

  1. (maybe) split off sign, work on |x|
  2. truncate the fixed-point encoding down to the LUT index width —
     "crypten" local truncation or "egk" probabilistic truncation, per
     cfg.encoder.trunc_method.lut
  3. one-round LUT evaluation (haar: single table; bior: two banks +
     private linear interpolation on the truncation remainder)
  4. range checks / sign reassembly with one extra comparison + mul

Method names, config keys, and round structure match the reference so that
configs carry over verbatim. Iterative methods (limit exp, Householder log,
Newton-Raphson reciprocal/sqrt, Chebyshev tanh, Taylor erf) are kept as
fallbacks and as the accuracy baseline.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..config import cfg
from ..mpc.mpc import MPCTensor
from .luts import LookupTables

__all__ = [
    "exp", "log", "reciprocal", "inv_sqrt", "sqrt", "_eix", "cossin",
    "cos", "sin", "sigmoid", "tanh", "erf", "gelu", "silu",
    "softmax", "log_softmax",
]


def _trunc_lut(x, truncation):
    """Truncate to LUT index (msb only) per cfg trunc method."""
    if cfg.encoder.trunc_method.lut == "crypten":
        return x.div(2 ** truncation)
    return x.egk_trunc_pr(62, truncation)


def _truncmod_lut(x, truncation):
    """(msb, lsb remainder) per cfg trunc method."""
    if cfg.encoder.trunc_method.lut == "crypten":
        return x.divmod(2 ** truncation)
    return x.egk_truncmod_pr(62, truncation)


def _nexp_lut(x, method):
    """exp(-x) for x >= 0 (reference approximations.py:349-386)."""
    luts = LookupTables()
    precision = 2 ** cfg.encoder.precision_bits
    size = cfg.functions.exp_neg_lut_size

    if method == "split":
        # x -> c = c1 * size + c0; exp(-x) = nexp_high[c1] * nexp_low[c0]
        # (reference approximations.py:355-366)
        xs = x.div(precision / 2 ** 4 / size)
        d = xs < 1
        xs_raw = MPCTensor(
            type(xs._tensor)(xs.share, type(xs.encoder)(0)), xs.ptype
        )
        c = d * xs_raw + (-d + 1) * (precision - 1)
        c0 = c
        c1 = c.div(size)
        t0 = c0.evaluate_lut(luts.LUTs["nexp_low"])
        t1 = c1.evaluate_lut(luts.LUTs["nexp_high"])
        return t0 * t1
    elif method == "haar":
        check = x < 2 ** cfg.functions.exp_lut_max_bits
        truncation = (
            cfg.functions.exp_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.exp_bior_size_bits
        )
        msb = _trunc_lut(x, truncation)
        lut = msb.evaluate_lut(luts.LUTs["nexp_haar"])
        return check * lut
    elif method == "bior":
        check = x < 2 ** cfg.functions.exp_lut_max_bits
        truncation = (
            cfg.functions.exp_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.exp_bior_size_bits
        )
        msb, lsb = _truncmod_lut(x, truncation)
        lut = msb.evaluate_bior_lut(luts.LUTs["nexp_bior"], lsb, truncation)
        return check * lut
    raise ValueError(f"Invalid method {method} for nexp function")


def exp(self):
    """exp via LUT or limit approximation (approximations.py:389-429)."""
    method = cfg.functions.exp_method

    if method in ("split", "haar", "bior"):
        if cfg.functions.exp_all_neg:
            return _nexp_lut(-self, method)
        luts = LookupTables()
        if method == "haar":
            truncation = (
                cfg.functions.exp_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.exp_haar_size_bits
            )
            msb = _trunc_lut(self, truncation)
            return msb.evaluate_lut(luts.LUTs["exp_haar"])
        if method == "bior":
            truncation = (
                cfg.functions.exp_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.exp_bior_size_bits
            )
            msb, lsb = _truncmod_lut(self, truncation)
            return msb.evaluate_bior_lut(luts.LUTs["exp_bior"], lsb, truncation)
        raise ValueError("split exp requires exp_all_neg")
    if method == "limit":
        iters = cfg.functions.exp_iterations
        result = self.div(2 ** iters) + 1
        for _ in range(iters):
            result = result.square()
        return result
    raise ValueError(f"Invalid method {method} given for exp function")


def log(self, input_in_01=False):
    """log via LUT or Householder iterations (approximations.py:432-502)."""
    if input_in_01:
        # ln(u) = ln(a*u) - ln(a). The reference uses a=100 tuned to the
        # iterative method's convergence domain (approximations.py:449-456),
        # but under LUT methods the log table only covers [0, 2^log_lut_max_bits)
        # — a=100 overflows the table for u > 0.64 (latent bug in the
        # reference's default config). Pick a = table max instead.
        if cfg.functions.log_method in ("haar", "bior"):
            # strictly below 2^max_bits: u == 1.0 exactly must not land ON
            # the table upper bound, where the mod-L LUT index wraps to
            # bucket 0 (log(1) would decode as the most-negative entry)
            a = float(2 ** cfg.functions.log_lut_max_bits) - 1.0
        else:
            a = 100.0
        return log(self.mul(a)) - math.log(a)

    iterations = cfg.functions.log_iterations
    exp_iterations = cfg.functions.log_exp_iterations
    order = cfg.functions.log_order
    method = cfg.functions.log_method

    if method in ("haar", "bior"):
        luts = LookupTables()
        if method == "haar":
            truncation = (
                cfg.functions.log_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.log_haar_size_bits
            )
            msb = _trunc_lut(self, truncation)
            return msb.evaluate_lut(luts.LUTs["log_haar"])
        truncation = (
            cfg.functions.log_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.log_bior_size_bits
        )
        msb, lsb = _truncmod_lut(self, truncation)
        return msb.evaluate_bior_lut(luts.LUTs["log_bior"], lsb, truncation)
    if method == "iter":
        term1 = self.div(120)
        term2 = exp(self.mul(2).add(1.0).neg()).mul(20)
        y = term1 - term2 + 3.0
        with cfg.temp_override({"functions.exp_iterations": exp_iterations}):
            for _ in range(iterations):
                h = -(self * exp(-y)) + 1
                y -= h.polynomial([1 / (i + 1) for i in range(order)])
        return y
    raise ValueError(f"Invalid method {method} given for log function")


def reciprocal(self, input_in_01=False):
    """1/x via LUT, Newton-Raphson, or exp(-log) (approximations.py:504)."""
    pos_override = {"functions.reciprocal_all_pos": True}
    if input_in_01:
        with cfg.temp_override(pos_override):
            rec = reciprocal(self.mul(64)).mul(64)
        return rec

    method = cfg.functions.reciprocal_method
    all_pos = cfg.functions.reciprocal_all_pos
    initial = cfg.functions.reciprocal_initial

    if not all_pos:
        sgn = self.sign()
        pos = sgn * self
        with cfg.temp_override(pos_override):
            return sgn * reciprocal(pos)

    if method in ("haar", "bior"):
        luts = LookupTables()
        if method == "haar":
            truncation = (
                cfg.functions.reciprocal_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.reciprocal_haar_size_bits
            )
            msb = _trunc_lut(self, truncation)
            return msb.evaluate_lut(luts.LUTs["reciprocal_haar"])
        truncation = (
            cfg.functions.reciprocal_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.reciprocal_bior_size_bits
        )
        msb, lsb = _truncmod_lut(self, truncation)
        return msb.evaluate_bior_lut(luts.LUTs["reciprocal_bior"], lsb, truncation)
    if method == "NR":
        nr_iters = cfg.functions.reciprocal_nr_iters
        if initial is None:
            result = (self.mul(-2).add(1.0)).exp().mul(3) + 0.003
        else:
            result = self.mul(0).add(float(initial))
        for _ in range(nr_iters):
            result = result + result - result.square().mul(self)
        return result
    if method == "log":
        log_iters = cfg.functions.reciprocal_log_iters
        with cfg.temp_override({"functions.log_iterations": log_iters}):
            return exp(-log(self))
    raise ValueError(f"Invalid method {method} given for reciprocal function")


def inv_sqrt(self):
    """1/sqrt(x) via LUT(s) or Newton-Raphson (approximations.py:591-650)."""
    initial = cfg.functions.sqrt_nr_initial
    iters = cfg.functions.sqrt_nr_iters
    method = cfg.functions.inv_sqrt_method

    if method in ("haar", "bior", "tailored_haar"):
        luts = LookupTables()
        if method == "haar":
            truncation = (
                cfg.functions.inv_sqrt_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.inv_sqrt_haar_size_bits
            )
            msb = _trunc_lut(self, truncation)
            return msb.evaluate_lut(luts.LUTs["inv_sqrt_haar"])
        if method == "bior":
            truncation = (
                cfg.functions.inv_sqrt_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.inv_sqrt_bior_size_bits
            )
            msb, lsb = _truncmod_lut(self, truncation)
            return msb.evaluate_bior_lut(luts.LUTs["inv_sqrt_bior"], lsb, truncation)
        # tailored_haar: two tables split at x = 1 (approximations.py:624-636)
        truncation_0 = (
            cfg.functions.inv_sqrt_tailored_0_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.inv_sqrt_tailored_0_haar_size_bits
        )
        truncation_1 = (
            cfg.functions.inv_sqrt_tailored_1_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.inv_sqrt_tailored_1_haar_size_bits
        )
        msb_0 = _trunc_lut(self, truncation_0)
        msb_1 = _trunc_lut(self, truncation_1)
        y_0 = msb_0.evaluate_lut(luts.LUTs["inv_sqrt_tailored_haar_0"])
        y_1 = msb_1.evaluate_lut(luts.LUTs["inv_sqrt_tailored_haar_1"])
        b = self < 1
        return b * y_0 + (-b + 1) * y_1
    if method == "NR":
        if initial is None:
            y = exp(self.div(2).add(0.2).neg()).mul(2.2).add(0.2)
            y = y - self.div(1024)
        else:
            y = self.mul(0).add(float(initial))
        for _ in range(iters):
            y = y.mul(-(self * y.square()) + 3).div(2)
        return y
    raise ValueError(f"Invalid method {method} given for inv_sqrt function")


def sqrt(self):
    """sqrt via LUT or NR inv_sqrt * x (approximations.py:652-687)."""
    method = cfg.functions.sqrt_method
    if method in ("haar", "bior"):
        luts = LookupTables()
        if method == "haar":
            truncation = (
                cfg.functions.sqrt_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.sqrt_haar_size_bits
            )
            msb = _trunc_lut(self, truncation)
            return msb.evaluate_lut(luts.LUTs["sqrt_haar"])
        truncation = (
            cfg.functions.sqrt_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.sqrt_bior_size_bits
        )
        msb, lsb = _truncmod_lut(self, truncation)
        return msb.evaluate_bior_lut(luts.LUTs["sqrt_bior"], lsb, truncation)
    if method == "NR":
        return inv_sqrt(self).mul(self)
    raise ValueError(f"Invalid method {method} given for sqrt function")


def _eix(self):
    """(cos(x), sin(x)) by repeated squaring of e^(ix/2^n)
    (approximations.py:690-711)."""
    iterations = cfg.functions.trig_iterations
    re = None
    im = self.div(2 ** iterations)
    re = -(im.square()) + 1
    im = im * 2
    for _ in range(iterations - 1):
        a2 = re.square()
        b2 = im.square()
        im = im.mul(re).mul(2)
        re = a2 - b2
    return re, im


def cossin(self):
    """cos & sin with range reduction mod 2*pi (approximations.py:714-770)."""
    method = cfg.functions.trigonometry_method
    if method in ("haar", "bior"):
        luts = LookupTables()
        sgn = self.sign()
        x = sgn * self
        x = x * (1.0 / (2 * np.pi))
        x = x.mod(2 ** cfg.encoder.precision_bits)
        if method == "haar":
            trig_truncation = (
                cfg.encoder.precision_bits - cfg.functions.trigonometry_haar_size_bits
            )
            msb = _trunc_lut(x, trig_truncation)
            cos_r = msb.evaluate_lut(luts.LUTs["cos_haar"])
            sin_r = msb.evaluate_lut(luts.LUTs["sin_haar"])
        else:
            trig_truncation = (
                cfg.encoder.precision_bits - cfg.functions.trigonometry_bior_size_bits
            )
            msb, lsb = _truncmod_lut(x, trig_truncation)
            cos_r = msb.evaluate_bior_lut(luts.LUTs["cos_bior"], lsb, trig_truncation)
            sin_r = msb.evaluate_bior_lut(luts.LUTs["sin_bior"], lsb, trig_truncation)
        return cos_r, sgn * sin_r
    if method in ("haar-lut-only", "bior-lut-only"):
        luts = LookupTables()
        x = self + 2 ** cfg.functions.trigonometry_lut_max_bits
        if method == "haar-lut-only":
            truncation = (
                cfg.functions.trigonometry_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.trigonometry_haar_size_bits
            )
            msb = _trunc_lut(x, truncation)
            return (
                msb.evaluate_lut(luts.LUTs["cos_haar_lut_only"]),
                msb.evaluate_lut(luts.LUTs["sin_haar_lut_only"]),
            )
        truncation = (
            cfg.functions.trigonometry_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.trigonometry_bior_size_bits
        )
        msb, lsb = _truncmod_lut(x, truncation)
        # NOTE: table swap matches reference approximations.py:764-765
        return (
            msb.evaluate_bior_lut(luts.LUTs["sin_bior_lut_only"], lsb, truncation),
            msb.evaluate_bior_lut(luts.LUTs["cos_bior_lut_only"], lsb, truncation),
        )
    if method == "NR":
        return _eix(self)
    raise ValueError(f"Invalid method {method} given for cossin function")


def cos(self):
    return cossin(self)[0]


def sin(self):
    return cossin(self)[1]


def sigmoid(self):
    """sigmoid (approximations.py:792-880)."""
    method = cfg.functions.sigmoid_tanh_method

    if method in ("haar", "bior"):
        luts = LookupTables()
        ltz = self._ltz()
        sgn = -(ltz.mul(2)) + 1
        absx = sgn * self
        if method == "haar":
            st_truncation = (
                cfg.functions.sigmoid_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.sigmoid_tanh_haar_size_bits
            )
            msb = _trunc_lut(absx, st_truncation)
            lut = msb.evaluate_lut(luts.LUTs["sigmoid_haar"])
        else:
            st_truncation = (
                cfg.functions.sigmoid_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.sigmoid_tanh_bior_size_bits
            )
            msb, lsb = _truncmod_lut(absx, st_truncation)
            lut = msb.evaluate_bior_lut(luts.LUTs["sigmoid_bior"], lsb, st_truncation)
        eval_ = ltz + sgn * lut
        limit = -ltz + 1
        check = absx < 2 ** cfg.functions.sigmoid_lut_max_bits - 1
        return limit + check * (eval_ - limit)
    if method in ("haar-lut-only", "bior-lut-only"):
        luts = LookupTables()
        x = self + 2 ** cfg.functions.sigmoid_lut_max_bits
        if method == "haar-lut-only":
            truncation = (
                cfg.functions.sigmoid_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.sigmoid_tanh_haar_size_bits
            )
            msb = _trunc_lut(x, truncation)
            return msb.evaluate_lut(luts.LUTs["sigmoid_haar_lut_only"])
        truncation = (
            cfg.functions.sigmoid_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.sigmoid_tanh_bior_size_bits
        )
        msb, lsb = _truncmod_lut(x, truncation)
        return msb.evaluate_bior_lut(luts.LUTs["sigmoid_bior_lut_only"], lsb, truncation)
    if method == "chebyshev":
        tanh_approx = tanh(self.div(2))
        return tanh_approx.div(2) + 0.5
    if method == "reciprocal":
        ltz = self._ltz()
        sgn = -(ltz.mul(2)) + 1
        pos_input = self.mul(sgn)
        denominator = pos_input.neg().exp().add(1)
        with cfg.temp_override(
            {
                "functions.exp_iterations": 9,
                "functions.reciprocal_nr_iters": 3,
                "functions.reciprocal_all_pos": True,
                "functions.reciprocal_initial": 0.75,
            }
        ):
            pos_output = denominator.reciprocal()
        return pos_output.where(-ltz + 1, -pos_output + 1)
    raise ValueError(f"Unrecognized method {method} for sigmoid")


def tanh(self):
    """tanh (approximations.py:883-957)."""
    method = cfg.functions.sigmoid_tanh_method

    if method in ("haar", "bior"):
        luts = LookupTables()
        sgn = self.sign()
        absx = sgn * self
        if method == "haar":
            st_truncation = (
                cfg.functions.tanh_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.sigmoid_tanh_haar_size_bits
            )
            msb = _trunc_lut(absx, st_truncation)
            lut = msb.evaluate_lut(luts.LUTs["tanh_haar"])
        else:
            st_truncation = (
                cfg.functions.tanh_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.sigmoid_tanh_bior_size_bits
            )
            msb, lsb = _truncmod_lut(absx, st_truncation)
            lut = msb.evaluate_bior_lut(luts.LUTs["tanh_bior"], lsb, st_truncation)
        check = absx < 2 ** cfg.functions.tanh_lut_max_bits - 1
        return sgn * (-check + 1 + lut * check)
    if method in ("haar-lut-only", "bior-lut-only"):
        luts = LookupTables()
        x = self + 2 ** cfg.functions.tanh_lut_max_bits
        if method == "haar-lut-only":
            truncation = (
                cfg.functions.tanh_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.sigmoid_tanh_haar_size_bits
            )
            msb = _trunc_lut(x, truncation)
            return msb.evaluate_lut(luts.LUTs["tanh_haar_lut_only"])
        truncation = (
            cfg.functions.tanh_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.sigmoid_tanh_bior_size_bits
        )
        msb, lsb = _truncmod_lut(x, truncation)
        return msb.evaluate_bior_lut(luts.LUTs["tanh_bior_lut_only"], lsb, truncation)
    if method == "reciprocal":
        return sigmoid(self.mul(2)).mul(2).sub(1)
    if method == "chebyshev":
        terms = cfg.functions.sigmoid_tanh_terms
        coeffs = _chebyshev_series_tanh(terms)[1::2]
        tanh_polys = _chebyshev_polynomials(self, terms)
        tanh_polys_flipped = tanh_polys.unsqueeze(-1).transpose(0, -1).squeeze(0)
        out = tanh_polys_flipped.matmul(coeffs)
        return out.hardtanh()
    raise ValueError(f"Unrecognized method {method} for tanh")


def _chebyshev_series_tanh(terms):
    """Chebyshev coefficients of tanh on [-1, 1] (reference util.py:31)."""
    n_samples = 2 * terms
    points = np.arange(n_samples)
    x = np.cos(np.pi * (points + 0.5) / n_samples)
    y = np.tanh(x)
    coeffs = np.array(
        [2.0 / n_samples * np.sum(y * np.cos(np.pi * k * (points + 0.5) / n_samples))
         for k in range(terms)]
    )
    return jnp.asarray(coeffs)


def _chebyshev_polynomials(self, terms):
    """Odd-degree Chebyshev polynomials at x (approximations.py:960-987)."""
    if terms % 2 != 0 or terms < 6:
        raise ValueError("Chebyshev terms must be even and >= 6")
    polynomials = [self.clone()]
    y = self.square().mul(4) - 2
    z = y - 1
    polynomials.append(z.mul(self))
    for k in range(2, terms // 2):
        polynomials.append(y * polynomials[k - 1] - polynomials[k - 2])
    return MPCTensor.stack(polynomials)


def erf(self):
    """erf (approximations.py:990-1044)."""
    method = cfg.functions.erf_method

    if method in ("haar", "bior"):
        luts = LookupTables()
        sgn = self.sign()
        absx = sgn * self
        if method == "haar":
            erf_truncation = (
                cfg.functions.erf_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.erf_haar_size_bits
            )
            msb = _trunc_lut(absx, erf_truncation)
            lut = msb.evaluate_lut(luts.LUTs["erf_haar"])
        else:
            erf_truncation = (
                cfg.functions.erf_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.erf_bior_size_bits
            )
            msb, lsb = _truncmod_lut(absx, erf_truncation)
            lut = msb.evaluate_bior_lut(luts.LUTs["erf_bior"], lsb, erf_truncation)
        check = absx < 2 ** cfg.functions.erf_lut_max_bits - 1
        return sgn * (-check + 1 + lut * check)
    if method in ("haar-lut-only", "bior-lut-only"):
        luts = LookupTables()
        x = self + 2 ** cfg.functions.erf_lut_max_bits
        if method == "haar-lut-only":
            truncation = (
                cfg.functions.erf_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.erf_haar_size_bits
            )
            msb = _trunc_lut(x, truncation)
            return msb.evaluate_lut(luts.LUTs["erf_haar_lut_only"])
        truncation = (
            cfg.functions.erf_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.erf_bior_size_bits
        )
        msb, lsb = _truncmod_lut(x, truncation)
        return msb.evaluate_bior_lut(luts.LUTs["erf_bior_lut_only"], lsb, truncation)
    if method == "Taylor":
        iters = cfg.functions.erf_iterations
        output = self.clone()
        for n in range(1, iters + 1):
            multiplier = ((-1) ** n) / (math.factorial(n) * (2 * n + 1))
            output = output.add(self.pos_pow(2 * n + 1).mul(multiplier))
        return output.mul(2.0 / math.sqrt(math.pi))
    raise ValueError(f"Unrecognized method {method} for erf")


def gelu(self):
    """gelu = relu - LUT(relu - gelu) (approximations.py:1046-1096)."""
    method = cfg.functions.gelu_method

    if method in ("haar", "bior"):
        luts = LookupTables()
        sgn = self.sign()
        absx = sgn * self
        drelu = -(self._ltz()) + 1
        relu = self * drelu
        if method == "haar":
            truncation = (
                cfg.functions.gelu_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.gelu_haar_size_bits
            )
            msb = _trunc_lut(absx, truncation)
            lut = msb.evaluate_lut(luts.LUTs["gelu_haar"])
        else:
            truncation = (
                cfg.functions.gelu_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.gelu_bior_size_bits
            )
            msb, lsb = _truncmod_lut(absx, truncation)
            lut = msb.evaluate_bior_lut(luts.LUTs["gelu_bior"], lsb, truncation)
        check = absx < 2 ** cfg.functions.gelu_lut_max_bits
        return relu - lut * check
    if method in ("haar-lut-only", "bior-lut-only"):
        luts = LookupTables()
        x = self + 2 ** cfg.functions.gelu_lut_max_bits
        if method == "haar-lut-only":
            truncation = (
                cfg.functions.gelu_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.gelu_haar_size_bits
            )
            msb = _trunc_lut(x, truncation)
            return msb.evaluate_lut(luts.LUTs["gelu_haar_lut_only"])
        truncation = (
            cfg.functions.gelu_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.gelu_bior_size_bits
        )
        msb, lsb = _truncmod_lut(x, truncation)
        return msb.evaluate_bior_lut(luts.LUTs["gelu_bior_lut_only"], lsb, truncation)
    if method == "erf":
        return self * ((self / math.sqrt(2)).erf() + 1) / 2
    raise ValueError(f"Unrecognized method {method} for gelu")


def silu(self):
    """silu = relu - LUT(relu - silu) (approximations.py:1098-1148)."""
    method = cfg.functions.silu_method

    if method in ("haar", "bior"):
        luts = LookupTables()
        sgn = self.sign()
        absx = sgn * self
        drelu = -(self._ltz()) + 1
        relu = self * drelu
        if method == "haar":
            truncation = (
                cfg.functions.silu_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.silu_haar_size_bits
            )
            msb = _trunc_lut(absx, truncation)
            lut = msb.evaluate_lut(luts.LUTs["silu_haar"])
        else:
            truncation = (
                cfg.functions.silu_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.silu_bior_size_bits
            )
            msb, lsb = _truncmod_lut(absx, truncation)
            lut = msb.evaluate_bior_lut(luts.LUTs["silu_bior"], lsb, truncation)
        check = absx < 2 ** cfg.functions.silu_lut_max_bits - 1
        return relu - lut * check
    if method in ("haar-lut-only", "bior-lut-only"):
        luts = LookupTables()
        x = self + 2 ** cfg.functions.silu_lut_max_bits
        if method == "haar-lut-only":
            truncation = (
                cfg.functions.silu_lut_max_bits
                + cfg.encoder.precision_bits
                - cfg.functions.silu_haar_size_bits
            )
            msb = _trunc_lut(x, truncation)
            return msb.evaluate_lut(luts.LUTs["silu_haar_lut_only"])
        truncation = (
            cfg.functions.silu_lut_max_bits
            + cfg.encoder.precision_bits
            - cfg.functions.silu_bior_size_bits
        )
        msb, lsb = _truncmod_lut(x, truncation)
        return msb.evaluate_bior_lut(luts.LUTs["silu_bior_lut_only"], lsb, truncation)
    if method == "sigmoid":
        return self * sigmoid(self)
    raise ValueError(f"Unrecognized method {method} for silu")


def softmax(self, dim=-1, mask=None, **kwargs):
    """max-shift -> exp(all-neg) -> reciprocal of sum (approximations.py:1150).

    ``mask``: optional PUBLIC 0/1 array (e.g. a causal attention mask),
    broadcastable to self. Masked-out lanes get probability exactly 0. All
    mask handling is local (public multiplies/adds — zero protocol cost):
    the row max is taken over unmasked lanes only (masked lanes are publicly
    pinned to the most-negative in-envelope value so they cannot win), and
    the exp numerator is publicly zeroed on masked lanes before
    normalization, so LUT-domain garbage on those lanes cancels."""
    if self.dim() == 0:
        return MPCTensor.encrypt(jnp.ones(()), src=0)
    if self.size(dim) == 1:
        out = jnp.ones(self.shape)
        if mask is not None:
            out = out * jnp.asarray(mask)
        return MPCTensor.encrypt(out, src=0)

    if mask is not None:
        from ..mpc.mpc import _compare_bits

        mask = jnp.asarray(mask).astype(jnp.float64)
        prec = self.encoder.precision_bits
        neg = -float(2 ** (_compare_bits() - 3 - prec))
        shifted = self.mul(mask).add((1.0 - mask) * neg)
        maximum_value = shifted.max_value(dim, keepdim=True)
    else:
        # max VALUES only: the reference's max(dim)[0] also derives the
        # argmax one-hot (full-width eq + tie-break) just to discard it
        maximum_value = self.max_value(dim, keepdim=True)
    logits = self - maximum_value
    with cfg.temp_override({"functions.exp_all_neg": True}):
        numerator = logits.exp()
    if mask is not None:
        numerator = numerator.mul(mask)
    denominator = numerator.sum(axis=dim, keepdim=True)
    with cfg.temp_override({"functions.reciprocal_all_pos": True}):
        inv_denominator = denominator.reciprocal()
    # Newton refinement of the LUT reciprocal: r <- r(2 - s r) squares the
    # relative error per step. The 8-bit haar table over [0, 64] has cells
    # 0.25 wide, so near s ~ 1.5 (a peaked softmax row) the raw LUT is off
    # by up to ~16% RELATIVE — measured identically on the actual reference
    # (same table math, reference approximations.py:1150-1166); two steps
    # take that to ~1e-3 for two extra Beaver muls on the (rows, 1)
    # denominator — negligible next to the exp/max stages. Set
    # functions.softmax_recip_refine: 0 for reference-exact parity mode.
    try:
        refine = int(cfg.functions.softmax_recip_refine)
    except AttributeError:
        refine = 2
    for _ in range(refine):
        inv_denominator = (
            inv_denominator + inv_denominator
            - denominator.mul(inv_denominator.square())
        )
    return numerator * inv_denominator


def log_softmax(self, dim=-1, **kwargs):
    """Numerically-stable log softmax (approximations.py:1169)."""
    if self.dim() == 0:
        return MPCTensor.encrypt(jnp.zeros(()), src=0)
    if self.size(dim) == 1:
        return MPCTensor.encrypt(jnp.zeros(self.shape), src=0)
    maximum_value = self.max_value(dim, keepdim=True)
    logits = self - maximum_value
    normalize_term = exp(logits).sum(axis=dim, keepdim=True)
    return logits - normalize_term.log()


for _name in __all__:
    _fn = globals()[_name]
    setattr(MPCTensor, _name.lstrip("_"), _fn)
setattr(MPCTensor, "_eix", _eix)
setattr(MPCTensor, "cossin", cossin)
