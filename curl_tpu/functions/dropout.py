"""Dropout from private uniform mask (reference:
curl/common/functions/dropout.py)."""

from __future__ import annotations

from ..mpc.mpc import MPCTensor

__all__ = ["dropout"]


def dropout(self, p=0.5, training=True, inplace=False):
    if p == 0.0:
        return self
    if p == 1.0:
        return self - self
    assert 0.0 < p < 1.0, "dropout probability has to be between 0 and 1"
    if not training:
        return self.clone()
    rand_tensor = MPCTensor.rand(*self.size())
    dropout_tensor = rand_tensor.gt(p)
    return self.div(1 - p).mul(dropout_tensor)


setattr(MPCTensor, "dropout", dropout)
