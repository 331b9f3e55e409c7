"""Weight initialization helpers (reference: curl/nn/init.py)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_key_counter = [1000]


def _next_key():
    _key_counter[0] += 1
    return jax.random.PRNGKey(_key_counter[0] * 6151 + 7)


def uniform_(shape, a=0.0, b=1.0):
    return jax.random.uniform(_next_key(), shape, minval=a, maxval=b,
                              dtype=jnp.float64)


def normal_(shape, mean=0.0, std=1.0):
    return jax.random.normal(_next_key(), shape, dtype=jnp.float64) * std + mean


def constant_(shape, val):
    return jnp.full(shape, val, dtype=jnp.float64)


def ones_(shape):
    return jnp.ones(shape, dtype=jnp.float64)


def zeros_(shape):
    return jnp.zeros(shape, dtype=jnp.float64)


def _fan(shape):
    if len(shape) == 2:
        fan_in, fan_out = shape[1], shape[0]
    else:
        rf = 1
        for s in shape[2:]:
            rf *= s
        fan_in, fan_out = shape[1] * rf, shape[0] * rf
    return fan_in, fan_out


def xavier_uniform_(shape, gain=1.0):
    fan_in, fan_out = _fan(shape)
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return uniform_(shape, -a, a)


def xavier_normal_(shape, gain=1.0):
    fan_in, fan_out = _fan(shape)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return normal_(shape, 0.0, std)


def kaiming_uniform_(shape, a=0, mode="fan_in"):
    fan_in, fan_out = _fan(shape)
    fan = fan_in if mode == "fan_in" else fan_out
    gain = math.sqrt(2.0 / (1 + a ** 2))
    bound = gain * math.sqrt(3.0 / fan)
    return uniform_(shape, -bound, bound)


def kaiming_normal_(shape, a=0, mode="fan_in"):
    fan_in, fan_out = _fan(shape)
    fan = fan_in if mode == "fan_in" else fan_out
    gain = math.sqrt(2.0 / (1 + a ** 2))
    return normal_(shape, 0.0, gain / math.sqrt(fan))
