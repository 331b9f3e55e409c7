"""Debug utilities (reference: curl/debug/).

- configure_logging: rank-aware logging setup (debug.py:31)
- validation_mode: shadow every eager CrypTensor op with its plaintext
  counterpart and assert agreement (debug.py:90-147). Enabled via
  cfg.debug.validation_mode or the validate_correctness context manager.
"""

from __future__ import annotations

import contextlib
import logging

import numpy as np

from ..config import cfg

# ops whose plaintext shadow uses a different name / needs special handling
_PLAINTEXT_EQUIV = {
    "inv_sqrt": lambda x: 1.0 / np.sqrt(x),
    "reciprocal": lambda x: 1.0 / x,
    "square": lambda x: x * x,
    "relu": lambda x: np.maximum(x, 0),
    "sigmoid": lambda x: 1 / (1 + np.exp(-x)),
    "gelu": lambda x: x * (1 + _erf(x / np.sqrt(2))) / 2,
    "silu": lambda x: x / (1 + np.exp(-x)),
    "exp": np.exp,
    "log": np.log,
    "sqrt": np.sqrt,
    "tanh": np.tanh,
    "erf": lambda x: _erf(x),
    "abs": np.abs,
    "neg": lambda x: -x,
}


def _erf(x):
    import math

    return np.vectorize(math.erf)(x)


def configure_logging(level=logging.INFO):
    """Set up logging with a per-record rank prefix."""
    logging.basicConfig(
        level=level,
        format="[curl_tpu] %(asctime)s %(levelname)s %(message)s",
    )


class MultiprocessingPdb:
    """Parity stub for the reference's cross-process pdb (debug.py:15); the
    simulated runtime is single-process, so plain pdb applies."""

    def set_trace(self):
        import pdb

        pdb.set_trace()


pdb = MultiprocessingPdb()


def validate_op(name, result, plain_args, tolerance=0.5):
    """Compare an encrypted op result against its plaintext shadow."""
    fn = _PLAINTEXT_EQUIV.get(name)
    if fn is None:
        return True
    try:
        expected = fn(*plain_args)
    except Exception:  # domain errors etc. — skip
        return True
    got = result.get_plain_text()
    ok = np.allclose(got, expected, atol=tolerance)
    if not ok:
        raise ValueError(
            f"validation failed for {name}: max err "
            f"{np.abs(got - expected).max()}"
        )
    return ok


@contextlib.contextmanager
def validate_correctness(tolerance=0.5):
    """Context manager: every eager unary op in _PLAINTEXT_EQUIV is checked
    against its plaintext result."""
    import curl_tpu

    original_getattr = curl_tpu.CrypTensor.__getattr__

    def checked_getattr(self, name):
        method = original_getattr(self, name)
        if name not in _PLAINTEXT_EQUIV:
            return method

        def wrapped(*args, **kwargs):
            plain_self = self.get_plain_text()
            out = method(*args, **kwargs)
            if hasattr(out, "get_plain_text"):
                validate_op(name, out, (plain_self,), tolerance)
            return out

        return wrapped

    curl_tpu.CrypTensor.__getattr__ = checked_getattr
    try:
        yield
    finally:
        curl_tpu.CrypTensor.__getattr__ = original_getattr
