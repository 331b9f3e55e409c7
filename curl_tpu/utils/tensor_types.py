"""Tensor type predicates (reference: curl/common/tensor_types.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def is_tensor(x) -> bool:
    return isinstance(x, (np.ndarray, jax.Array))


def is_float_tensor(x) -> bool:
    return is_tensor(x) and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)


def is_int_tensor(x) -> bool:
    return is_tensor(x) and jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer)


def is_encrypted_tensor(x) -> bool:
    import curl_tpu

    return curl_tpu.is_encrypted_tensor(x)
