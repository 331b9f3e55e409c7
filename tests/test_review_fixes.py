"""Regression tests for the round-2 self-review findings: ONNX graph-op
attribute semantics, plain-mode mask parity, LUT log boundary, and fused
kernel runtime gating."""

import numpy as np
import pytest

import curl_tpu
from curl_tpu import nn
from curl_tpu.nn import onnx_ops


# ---------------------------------------------------------------------------
# ONNX graph-op attribute semantics
# ---------------------------------------------------------------------------

def test_gather_missing_axis_defaults_to_zero():
    # ONNX spec: axis attribute is optional with default 0, NOT a flat take
    g = onnx_ops.Gather.from_onnx({})
    table = np.arange(12.0).reshape(4, 3)
    out = g([curl_tpu.cryptensor(table), np.array([2, 0])])
    np.testing.assert_allclose(
        out.get_plain_text(), table[[2, 0]], atol=1e-3
    )


def test_slice_negative_start_end():
    s = onnx_ops.Slice(None, None)
    x = np.arange(10.0).reshape(2, 5)
    # x[:, -3:-1] via the 5-input runtime form with INT64 sentinel handling
    out = s([
        curl_tpu.cryptensor(x),
        np.array([-3]), np.array([-1]), np.array([1]), np.array([1]),
    ])
    np.testing.assert_allclose(out.get_plain_text(), x[:, -3:-1], atol=1e-3)
    # torch-exporter idiom for x[:, -1:]: starts=[-1], ends=[INT64_MAX]
    out = s([
        curl_tpu.cryptensor(x),
        np.array([-1]), np.array([np.iinfo(np.int64).max]), np.array([1]),
        np.array([1]),
    ])
    np.testing.assert_allclose(out.get_plain_text(), x[:, -1:], atol=1e-3)


def test_conv_from_onnx_keeps_per_dim_strides():
    c = onnx_ops.Conv.from_onnx(
        {"strides": [2, 1], "pads": [1, 0, 1, 0], "dilations": [1, 1]}
    )
    assert c.stride == (2, 1)
    assert c.padding == (1, 0)
    x = np.random.default_rng(0).normal(size=(1, 2, 6, 6))
    w = np.random.default_rng(1).normal(size=(3, 2, 3, 3)) * 0.3
    out = c([curl_tpu.cryptensor(x), curl_tpu.cryptensor(w)])
    import torch
    import torch.nn.functional as F

    expected = F.conv2d(
        torch.tensor(x), torch.tensor(w), stride=(2, 1), padding=(1, 0)
    ).numpy()
    assert out.shape == expected.shape
    np.testing.assert_allclose(out.get_plain_text(), expected, atol=0.05)


def test_conv_from_onnx_asymmetric_pads_raise():
    with pytest.raises(NotImplementedError):
        onnx_ops.Conv.from_onnx({"pads": [1, 1, 0, 0]})


def test_pool_from_onnx_keeps_per_dim_kernel():
    p = onnx_ops._Pool2d.from_onnx(
        "average", {"kernel_shape": [2, 3], "strides": [2, 3]}
    )
    x = np.random.default_rng(2).normal(size=(1, 1, 4, 6))
    out = p(curl_tpu.cryptensor(x))
    import torch
    import torch.nn.functional as F

    expected = F.avg_pool2d(torch.tensor(x), (2, 3), stride=(2, 3)).numpy()
    assert out.shape == expected.shape
    np.testing.assert_allclose(out.get_plain_text(), expected, atol=0.01)


def test_squeeze_multiple_axes():
    sq = onnx_ops.Squeeze.from_onnx({"axes": [0, 2]})
    x = np.random.default_rng(3).normal(size=(1, 3, 1, 4))
    out = sq(curl_tpu.cryptensor(x))
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out.get_plain_text(), x.squeeze((0, 2)), atol=1e-3)


# ---------------------------------------------------------------------------
# PlainTensor mask parity
# ---------------------------------------------------------------------------

def test_plain_softmax_honors_mask():
    from curl_tpu.nn.plain import PlainTensor

    x = np.array([[1.0, 2.0, 3.0], [0.5, 0.1, -1.0]])
    mask = np.array([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    plain = PlainTensor(x).softmax(-1, mask=mask)
    got = np.asarray(plain.v)
    # exact float masked softmax (plain mode has no protocol noise)
    masked = np.where(mask != 0, x, -np.inf)
    expected = np.exp(masked) / np.exp(masked).sum(-1, keepdims=True)
    np.testing.assert_allclose(got, expected, atol=1e-6)
    # same semantics as the encrypted path, up to the haar reciprocal
    # LUT's resolution (8-bit table: ~bucket-midpoint error near 1.0)
    enc = curl_tpu.cryptensor(x).softmax(-1, mask=mask).get_plain_text()
    assert enc[0, 2] == 0.0 and enc[1, 1] == 0.0 and enc[1, 2] == 0.0
    np.testing.assert_allclose(got, enc, atol=0.15)


# ---------------------------------------------------------------------------
# LUT log(input_in_01) boundary
# ---------------------------------------------------------------------------

def test_log_input_in_01_at_exactly_one():
    # u = 1.0 exactly must not wrap the LUT index to bucket 0
    u = np.array([1.0, 0.5, 0.25])
    out = curl_tpu.cryptensor(u).log(input_in_01=True).get_plain_text()
    np.testing.assert_allclose(out, np.log(u), atol=0.1)


# ---------------------------------------------------------------------------
# fused-kernel runtime gating
# ---------------------------------------------------------------------------

def test_fused_max_disabled_under_shard_map_runtime():
    from curl_tpu import comm
    from curl_tpu.functions.maximum import _use_fused_max_step
    from curl_tpu.parallel.runner import mpc_context
    from curl_tpu import random as rng_mod

    import jax

    keys = rng_mod.make_party_keys(5, 2)
    party0 = jax.tree_util.tree_map(lambda a: a[0], keys)
    with curl_tpu.cfg.temp_override({"mpc.fused_max_step": "pallas_tpu"}):
        with mpc_context(party0, 2, runtime="shard_map"):
            assert comm.get_runtime() == "shard_map"
            assert not _use_fused_max_step()
        # default runtime restored
        assert comm.get_runtime() == "vmap"
