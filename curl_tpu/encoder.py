"""Fixed-point encoder: float <-> scaled uint64 ring elements.

Semantics mirror the reference encoder exactly (reference: curl/encoder.py:
32-94): scale = 2^precision_bits, encode multiplies-and-truncates to int64,
decode divides the *signed* view so negative values round correctly. Decode
happens on the host in numpy (float64 is not a TPU-native type and decode
only occurs at reveal boundaries).
"""

from __future__ import annotations

import numbers

import jax.numpy as jnp
import numpy as np

from . import ring
from .config import cfg


def nearest_integer_division(tensor, integer: int):
    """Round-to-nearest division of a signed numpy int64 array (encoder.py:18)."""
    assert integer > 0
    t = tensor.astype(np.int64)
    lez = (t < 0).astype(np.int64)
    pos_rem = (1 - lez) * np.mod(t, integer)
    neg_rem = lez * np.mod(integer - t, integer)
    rem = pos_rem + neg_rem
    quot = np.trunc(t / integer).astype(np.int64) if integer != 0 else t
    # exact integer trunc-division (avoid float roundoff for big values):
    quot = np.sign(t) * (np.abs(t) // integer)
    corr = (2 * rem > integer).astype(np.int64)
    return quot + np.sign(t) * corr


class FixedPointEncoder:
    """Encodes/decodes to the 2^-precision fixed-point representation."""

    def __init__(self, precision_bits=None):
        if precision_bits is None:
            precision_bits = cfg.encoder.precision_bits
        self._precision_bits = int(precision_bits)

    @property
    def scale(self) -> int:
        return 1 << self._precision_bits

    @property
    def precision_bits(self) -> int:
        return self._precision_bits

    def encode(self, x, dtype=jnp.uint64):
        """Encode python scalars / float arrays / int arrays into the ring."""
        if isinstance(x, (bool, np.bool_)):
            x = int(x)
        if isinstance(x, numbers.Integral):
            return ring.scalar(int(x) * self.scale)
        if isinstance(x, numbers.Real):
            return ring.scalar(int(x * self.scale))
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            # match reference: (scale * x).long() — C-style truncation
            scaled = x.astype(jnp.float64) * float(self.scale)
            return jnp.trunc(scaled).astype(jnp.int64).view(jnp.uint64)
        if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
            return x.astype(jnp.int64).view(jnp.uint64) * jnp.uint64(self.scale)
        raise TypeError(f"cannot encode dtype {x.dtype}")

    def decode(self, tensor) -> np.ndarray:
        """Decode revealed ring values to float64 on host (encoder.py:68)."""
        if tensor is None:
            return None
        t = np.asarray(tensor).astype(np.uint64).view(np.int64)
        if self.scale > 1:
            return t.astype(np.float64) / float(self.scale)
        return nearest_integer_division(t, self.scale).astype(np.float64)

    def __repr__(self):
        return f"FixedPointEncoder(scale={self.scale})"
