"""PlainTensor: run converted graphs UNENCRYPTED through the same modules.

The reference's nn modules execute on plain torch tensors until
.encrypt() swaps parameters for CrypTensors (reference curl/nn/module.py —
every forward is written against the shared torch/CrypTensor surface).
curl_tpu modules are written against the MPCTensor method surface instead,
so plaintext execution needs an adapter: PlainTensor wraps a jnp array and
exposes the MPCTensor-style methods modules call (matmul/t/sigmoid/...),
computing them exactly in float. Graph/GraphModule wrap un-encrypted
inputs automatically (onnx_ops.Graph.forward), so `graph(np_array)` works
like the reference's unencrypted path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PlainTensor", "wrap_plain", "unwrap_plain"]


class PlainTensor:
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = jnp.asarray(getattr(v, "v", v), jnp.float64)

    # -- interop --------------------------------------------------------
    def __array__(self, dtype=None):
        return np.asarray(self.v, dtype)

    def get_plain_text(self):
        return np.asarray(self.v)

    def __repr__(self):
        return f"PlainTensor(shape={self.v.shape})"

    # -- structure -------------------------------------------------------
    @property
    def shape(self):
        return self.v.shape

    @property
    def ndim(self):
        return self.v.ndim

    def size(self, dim=None):
        return self.v.shape if dim is None else self.v.shape[dim]

    def dim(self):
        return self.v.ndim

    def _w(self, x):
        return PlainTensor(x)

    @staticmethod
    def _val(x):
        if isinstance(x, PlainTensor):
            return x.v
        return jnp.asarray(x, jnp.float64)

    # -- shape ops ---------------------------------------------------------
    def t(self):
        return self._w(self.v.T)

    def transpose(self, a, b):
        return self._w(jnp.swapaxes(self.v, a, b))

    def permute(self, *dims):
        return self._w(jnp.transpose(self.v, dims))

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return self._w(self.v.reshape(shape))

    view = reshape

    def flatten(self, start_dim=0, end_dim=-1):
        s = list(self.v.shape)
        end = end_dim % len(s)
        merged = int(np.prod(s[start_dim : end + 1]))
        return self._w(self.v.reshape(s[:start_dim] + [merged] + s[end + 1 :]))

    def unsqueeze(self, dim):
        return self._w(jnp.expand_dims(self.v, dim))

    def squeeze(self, dim=None):
        return self._w(jnp.squeeze(self.v, dim))

    def split(self, size, dim=0):
        if isinstance(size, int):
            n = self.v.shape[dim]
            sizes = [size] * (n // size) + ([n % size] if n % size else [])
        else:
            sizes = list(size)
        idx = np.cumsum(sizes)[:-1]
        return [self._w(p) for p in jnp.split(self.v, idx, axis=dim)]

    def roll(self, shifts, dims=None):
        return self._w(jnp.roll(self.v, shifts, axis=dims))

    def expand(self, *sizes):
        return self._w(jnp.broadcast_to(self.v, sizes))

    def pad(self, pad, value=0.0, mode="constant"):
        cfgp = []
        flat = list(pad)
        nd = self.v.ndim
        per_axis = [(0, 0)] * nd
        for i in range(len(flat) // 2):
            per_axis[nd - 1 - i] = (flat[2 * i], flat[2 * i + 1])
        return self._w(
            jnp.pad(self.v, per_axis, mode="constant", constant_values=value)
        )

    def __getitem__(self, idx):
        return self._w(self.v[idx])

    # -- arithmetic --------------------------------------------------------
    def add(self, y):
        return self._w(self.v + self._val(y))

    def sub(self, y):
        return self._w(self.v - self._val(y))

    def mul(self, y):
        return self._w(self.v * self._val(y))

    def div(self, y):
        return self._w(self.v / self._val(y))

    def neg(self):
        return self._w(-self.v)

    def matmul(self, y):
        return self._w(self.v @ self._val(y))

    def square(self):
        return self._w(self.v * self.v)

    def pow(self, p):
        return self._w(self.v**p)

    def sum(self, axis=None, keepdim=False):
        return self._w(self.v.sum(axis=axis, keepdims=keepdim))

    def mean(self, axis=None, keepdim=False):
        return self._w(self.v.mean(axis=axis, keepdims=keepdim))

    def var(self, axis=None, keepdim=False, unbiased=False):
        ddof = 1 if unbiased else 0
        return self._w(self.v.var(axis=axis, keepdims=keepdim, ddof=ddof))

    __add__ = __radd__ = add
    __sub__ = sub
    __mul__ = __rmul__ = mul
    __truediv__ = div
    __matmul__ = matmul
    __neg__ = neg

    def __rsub__(self, y):
        return self._w(self._val(y) - self.v)

    # -- nonlinearities (exact float) ---------------------------------------
    def sigmoid(self):
        return self._w(jax.nn.sigmoid(self.v))

    def relu(self):
        return self._w(jax.nn.relu(self.v))

    def gelu(self):
        return self._w(jax.nn.gelu(self.v, approximate=False))

    def silu(self):
        return self._w(jax.nn.silu(self.v))

    def tanh(self):
        return self._w(jnp.tanh(self.v))

    def exp(self):
        return self._w(jnp.exp(self.v))

    def log(self):
        return self._w(jnp.log(self.v))

    def sqrt(self):
        return self._w(jnp.sqrt(self.v))

    def reciprocal(self):
        return self._w(1.0 / self.v)

    def inv_sqrt(self):
        return self._w(1.0 / jnp.sqrt(self.v))

    def max_value(self, dim=None, keepdim=False):
        if dim is None:
            return self._w(self.v.max())
        return self._w(self.v.max(axis=dim, keepdims=keepdim))

    def evaluate_embed(self, embed):
        """Plain embedding lookup: integer-index table gather (the exact
        semantics the private rotated-one-hot protocol computes)."""
        table = jnp.asarray(self._val(embed))
        return self._w(table[self.v.astype(jnp.int32)])

    def softmax(self, dim=-1, mask=None, **kw):
        # honor the public mask exactly like the encrypted softmax does
        # (masked lanes pinned to 0) — otherwise plain-mode causal
        # attention would silently be non-causal
        x = self.v
        if mask is not None:
            x = jnp.where(jnp.asarray(mask) != 0, x, -jnp.inf)
        return self._w(jax.nn.softmax(x, axis=dim))

    def log_softmax(self, dim=-1, mask=None, **kw):
        x = self.v
        if mask is not None:
            x = jnp.where(jnp.asarray(mask) != 0, x, -jnp.inf)
        return self._w(jax.nn.log_softmax(x, axis=dim))

    def dropout(self, p=0.5, training=False, inplace=False):
        return self

    def hardtanh(self, min_value=-1.0, max_value=1.0):
        return self._w(jnp.clip(self.v, min_value, max_value))

    def erf(self):
        return self._w(jax.scipy.special.erf(self.v))

    # -- comparisons ---------------------------------------------------------
    def ge(self, y):
        return self._w((self.v >= self._val(y)).astype(jnp.float64))

    def gt(self, y):
        return self._w((self.v > self._val(y)).astype(jnp.float64))

    def le(self, y):
        return self._w((self.v <= self._val(y)).astype(jnp.float64))

    def lt(self, y):
        return self._w((self.v < self._val(y)).astype(jnp.float64))

    def eq(self, y):
        return self._w((self.v == self._val(y)).astype(jnp.float64))

    def abs(self):
        return self._w(jnp.abs(self.v))

    def max(self, dim=None, keepdim=False, one_hot=False):
        if dim is None:
            return self._w(self.v.max())
        m = self.v.max(axis=dim, keepdims=keepdim)
        a = self.v.argmax(axis=dim, keepdims=keepdim).astype(jnp.float64)
        return self._w(m), self._w(a)

    def min(self, dim=None, keepdim=False, one_hot=False):
        if dim is None:
            return self._w(self.v.min())
        m = self.v.min(axis=dim, keepdims=keepdim)
        a = self.v.argmin(axis=dim, keepdims=keepdim).astype(jnp.float64)
        return self._w(m), self._w(a)

    # -- conv / pooling ------------------------------------------------------
    def conv2d(self, kernel, stride=1, padding=0, dilation=1, groups=1):
        from jax import lax

        k = self._val(kernel)
        stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
        dilation = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
        out = lax.conv_general_dilated(
            self.v, k, stride, [(p, p) for p in padding],
            rhs_dilation=dilation, feature_group_count=groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return self._w(out)

    def conv1d(self, kernel, stride=1, padding=0, dilation=1, groups=1):
        from jax import lax

        k = self._val(kernel)
        stride = (stride,) if isinstance(stride, int) else tuple(stride)
        padding = (padding,) if isinstance(padding, int) else tuple(padding)
        dilation = (dilation,) if isinstance(dilation, int) else tuple(dilation)
        out = lax.conv_general_dilated(
            self.v, k, stride, [(p, p) for p in padding],
            rhs_dilation=dilation, feature_group_count=groups,
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return self._w(out)

    def _pool2d(self, kind, kernel_size, stride=None, padding=0):
        from jax import lax

        ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        st = ks if stride is None else (
            (stride, stride) if isinstance(stride, int) else tuple(stride)
        )
        pd = (padding, padding) if isinstance(padding, int) else tuple(padding)
        window = (1, 1) + ks
        strides = (1, 1) + st
        pads = ((0, 0), (0, 0)) + tuple((p, p) for p in pd)
        if kind == "max":
            out = lax.reduce_window(self.v, -jnp.inf, lax.max, window, strides, pads)
        else:
            s = lax.reduce_window(self.v, 0.0, lax.add, window, strides, pads)
            out = s / (ks[0] * ks[1])
        return self._w(out)

    def max_pool2d(self, kernel_size, stride=None, padding=0, **kw):
        return self._pool2d("max", kernel_size, stride, padding)

    def avg_pool2d(self, kernel_size, stride=None, padding=0, **kw):
        return self._pool2d("avg", kernel_size, stride, padding)

    def clone(self):
        return self._w(self.v)


def wrap_plain(x):
    """Wrap plain arrays; pass encrypted tensors (or non-tensors) through."""
    import curl_tpu

    if isinstance(x, PlainTensor) or curl_tpu.is_encrypted_tensor(x):
        return x
    if isinstance(x, (np.ndarray, jnp.ndarray)) or np.isscalar(x):
        return PlainTensor(x)
    return x


def unwrap_plain(x):
    if isinstance(x, PlainTensor):
        return np.asarray(x.v)
    if isinstance(x, (tuple, list)):
        return type(x)(unwrap_plain(e) for e in x)
    return x
