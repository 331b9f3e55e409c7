"""Max/adaptive pooling over encrypted tensors (reference:
curl/common/functions/pooling.py). max_pool2d rearranges each window into a
trailing axis and runs the private max reduction over it; pads use a large
negative constant so padding never wins."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..mpc.mpc import MPCTensor

__all__ = [
    "_max_pool2d_backward",
    "adaptive_avg_pool2d",
    "adaptive_max_pool2d",
    "max_pool2d",
]


def _pooling_output_shape(input_size, kernel_size, pad_l, pad_r, stride, dilation, ceil_mode):
    numerator = input_size + pad_l + pad_r - dilation * (kernel_size - 1) - 1
    if ceil_mode:
        numerator += stride - 1
    output_size = numerator // stride + 1
    if ceil_mode and (output_size - 1) * stride >= input_size + pad_l:
        output_size -= 1
    return output_size


def _pool2d_reshape(self, kernel_size, padding=None, stride=None, dilation=1,
                    ceil_mode=False, pad_value=0):
    """Windows -> trailing axis (reference pooling.py:342)."""
    k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
    s = k if stride is None else ((stride, stride) if isinstance(stride, int) else tuple(stride))
    d = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
    if padding is None:
        padding = (0, 0)
    elif isinstance(padding, int):
        padding = (padding, padding)

    n = self.shape[:-2]
    h = _pooling_output_shape(self.shape[-2], k[0], padding[0], padding[0], s[0], d[0], ceil_mode)
    w = _pooling_output_shape(self.shape[-1], k[1], padding[1], padding[1], s[1], d[1], ceil_mode)
    out_size = tuple(n) + (h, w)

    x = self.pad((padding[1], padding[1], padding[0], padding[0]), value=pad_value)
    if ceil_mode:
        extra_h = h * s[0] + (k[0] - 1) * d[0] - x.shape[-2]
        extra_w = w * s[1] + (k[1] - 1) * d[1] - x.shape[-1]
        x = x.pad((0, max(extra_w, 0), 0, max(extra_h, 0)), value=pad_value)

    # window index grid: (h, w, k0*k1)
    row_idx = (jnp.arange(h) * s[0])[:, None, None, None] + (
        jnp.arange(k[0]) * d[0]
    )[None, None, :, None]
    col_idx = (jnp.arange(w) * s[1])[None, :, None, None] + (
        jnp.arange(k[1]) * d[1]
    )[None, None, None, :]
    row_idx = jnp.broadcast_to(row_idx, (h, w, k[0], k[1]))
    col_idx = jnp.broadcast_to(col_idx, (h, w, k[0], k[1]))
    windows = x.share[..., row_idx, col_idx]          # (..., h, w, k0, k1)
    windows = windows.reshape(tuple(n) + (h, w, k[0] * k[1]))
    out = MPCTensor(type(self._tensor)(windows, self.encoder), self.ptype)
    return out, out_size


def max_pool2d(self, kernel_size, padding=0, stride=None, dilation=1,
               ceil_mode=False, return_indices=False):
    windows, output_size = _pool2d_reshape(
        self, kernel_size, padding=padding, stride=stride, dilation=dilation,
        ceil_mode=ceil_mode, pad_value=-(2 ** 24),
    )
    max_vals, argmax_vals = windows.max(dim=-1, one_hot=True)
    max_vals = max_vals.view(output_size)
    if return_indices:
        k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        argmax_vals = argmax_vals.view(output_size + k)
        return max_vals, argmax_vals
    return max_vals


def _max_pool2d_backward(self, indices, kernel_size, padding=None, stride=None,
                         dilation=1, ceil_mode=False, output_size=None):
    """Scatter gradients through the argmax one-hots (pooling.py:56)."""
    if padding is None:
        padding = 0
    if isinstance(padding, int):
        padding = (padding, padding)
    p0, p1 = padding
    if stride is None:
        stride = kernel_size
    if isinstance(stride, int):
        stride = (stride, stride)
    s0, s1 = stride
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    d0, d1 = dilation
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    k0, k1 = kernel_size

    assert self.dim() == 4, "Input to _max_pool2d_backward must have 4 dimensions"
    assert indices.dim() == 6, "Indices input must have 6 dimensions"

    kernels = self.view(self.size() + (1, 1)) * indices

    if output_size is None:
        output_size = (
            self.size(0), self.size(1),
            s0 * self.size(2) - 2 * p0, s1 * self.size(3) - 2 * p1,
        )
    result_size = list(output_size)
    result_size[-2] += 2 * p0
    result_size[-1] += 2 * p1
    if ceil_mode:
        c0 = self.size(-1) * s1 + (k1 - 1) * d1 - output_size[-1]
        c1 = self.size(-2) * s0 + (k0 - 1) * d0 - output_size[-2]
        result_size[-2] += c0
        result_size[-1] += c1

    share = jnp.zeros(tuple(result_size), dtype=jnp.uint64)
    kshare = kernels.share
    for i in range(self.size(2)):
        for j in range(self.size(3)):
            li, ti = s0 * i, s1 * j
            share = share.at[
                :, :, li : li + k0 * d0 : d0, ti : ti + k1 * d1 : d1
            ].add(kshare[:, :, i, j])

    if ceil_mode:
        share = share[:, :, : share.shape[2] - c0, : share.shape[3] - c1]
    share = share[:, :, p0 : share.shape[2] - p0, p1 : share.shape[3] - p1]
    return MPCTensor(type(self._tensor)(share, kernels.encoder), self.ptype)


def adaptive_avg_pool2d(self, output_size):
    if output_size is None or output_size[0] is None:
        output_size = self.shape[-2:]
    if tuple(self.shape[-2:]) == tuple(output_size):
        return self.clone()
    resized, args, kwargs = _adaptive_pool2d_helper(self, output_size, reduction="mean")
    return resized.avg_pool2d(*args, **kwargs)


def adaptive_max_pool2d(self, output_size, return_indices=False):
    if output_size is None or output_size[0] is None:
        output_size = self.shape[-2:]
    if tuple(self.shape[-2:]) == tuple(output_size):
        if return_indices:
            ones = jnp.ones(self.size() + tuple(output_size))
            return self.clone(), MPCTensor.encrypt(ones, src=0)
        return self.clone()
    resized, args, kwargs = _adaptive_pool2d_helper(self, output_size, reduction="max")
    return resized.max_pool2d(*args, **kwargs, return_indices=return_indices)


def _adaptive_pool2d_helper(inp, output_size, reduction="mean"):
    """Resize input by repeating/extending rows so a uniform kernel matches
    torch's adaptive pooling semantics (pooling.py:199)."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    output_size = list(output_size)
    for i in range(2):
        if output_size[i] is None:
            output_size[i] = inp.shape[-2 + i]

    in_h, in_w = inp.shape[-2:]
    out_h, out_w = output_size

    def compute_kernels(in_size, out_size):
        # start/end indices per output cell, like torch adaptive pooling
        starts = [(i * in_size) // out_size for i in range(out_size)]
        ends = [-(-((i + 1) * in_size) // out_size) for i in range(out_size)]
        return starts, ends

    def resize_dim(x, dim, starts, ends, out_size):
        # Build index list repeating boundary rows so all kernels share the
        # max kernel size; for mean, repeated rows are scaled on decode side
        sizes = [e - s for s, e in zip(starts, ends)]
        k = max(sizes)
        idx = []
        for s, e in zip(starts, ends):
            cell = list(range(s, e))
            while len(cell) < k:
                cell.append(cell[-1])  # repeat last row
            idx.extend(cell)
        arr = jnp.asarray(idx)
        return x.index_select(dim, arr), k

    x = inp
    ks = []
    for axis, (size_in, size_out) in ((-2, (in_h, out_h)), (-1, (in_w, out_w))):
        starts, ends = compute_kernels(size_in, size_out)
        if reduction == "mean" and any(
            (e - s) != (ends[0] - starts[0]) for s, e in zip(starts, ends)
        ):
            raise NotImplementedError(
                "adaptive_avg_pool2d with non-uniform kernels is not supported"
            )
        x, k = resize_dim(x, axis, starts, ends, size_out)
        ks.append(k)

    args = ((ks[0], ks[1]),)
    kwargs = {"stride": (ks[0], ks[1])}
    return x, args, kwargs


for _name, _fn in (
    ("max_pool2d", max_pool2d),
    ("_max_pool2d_backward", _max_pool2d_backward),
    ("adaptive_avg_pool2d", adaptive_avg_pool2d),
    ("adaptive_max_pool2d", adaptive_max_pool2d),
):
    setattr(MPCTensor, _name, _fn)
