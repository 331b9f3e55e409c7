"""Parametrized sweep over the ONNX-style graph-op module surface.

Parity scope: reference test/test_nn.py:307-520 (module-by-module forward
checks with from_onnx-built instances) and test/test_onnx_converter.py's
node-semantics checks. Each case builds the module exactly the way the
graph builder does (via from_onnx with ONNX attribute dicts where the
reference exercises that path), runs it on encrypted inputs, and compares
the decoded output against plain numpy/torch semantics. A second pass runs
the same module in plain (PlainTensor) mode where supported.
"""

import numpy as np
import pytest

import curl_tpu
from curl_tpu import nn
from curl_tpu.nn import onnx_ops


def enc(x, precision=None):
    kwargs = {} if precision is None else {"precision": precision}
    return curl_tpu.cryptensor(np.asarray(x, dtype=np.float64), **kwargs)


def dec(x):
    return np.asarray(x.get_plain_text() if hasattr(x, "get_plain_text") else x)


RNG = np.random.default_rng(77)


@pytest.fixture(autouse=True)
def _reseed():
    """Each test draws from a freshly-seeded stream so values (and the LUT
    cells they land in) don't depend on which other tests ran."""
    global RNG
    RNG = np.random.default_rng(77)
    yield


# ---------------------------------------------------------------------------
# elementwise binary ops: encrypted x encrypted, encrypted x public,
# public x encrypted (the swapped-operand routing)
# ---------------------------------------------------------------------------

BIN_CASES = [
    ("Add", lambda a, b: a + b),
    ("Sub", lambda a, b: a - b),
    ("Mul", lambda a, b: a * b),
    ("Div", lambda a, b: a / b),
]


@pytest.mark.parametrize("name,ref", BIN_CASES, ids=[c[0] for c in BIN_CASES])
@pytest.mark.parametrize("mode", ["enc_enc", "enc_pub", "pub_enc"])
def test_binary_ops(name, ref, mode):
    cls = getattr(onnx_ops, name)
    m = cls.from_onnx({})
    a = RNG.uniform(0.5, 2.0, size=(3, 4))
    # private division goes through the reciprocal LUT, whose haar cells are
    # accurate on [2, 32] (same envelope as the reference — see
    # tests/test_functions.py::test_reciprocal_domain); keep divisors there
    b = RNG.uniform(2.0, 8.0, size=(3, 4)) if name == "Div" else RNG.uniform(
        0.5, 2.0, size=(3, 4)
    )
    ea = enc(a) if mode != "pub_enc" else a
    eb = enc(b) if mode != "enc_pub" else b
    out = dec(m([ea, eb]))
    atol = 0.05 if name == "Div" else 0.01
    np.testing.assert_allclose(out, ref(a, b), atol=atol)


def test_pow_sqrt_exp_erf():
    x = RNG.uniform(0.3, 2.0, size=(8,))
    assert np.allclose(dec(onnx_ops.Pow()([enc(x), np.array(2.0)])), x**2, atol=0.02)
    # sqrt haar LUT envelope: [4, 200] within 0.25 (test_functions.py)
    xs = RNG.uniform(4.0, 64.0, size=(8,))
    assert np.allclose(dec(onnx_ops.Sqrt()(enc(xs))), np.sqrt(xs), atol=0.25)
    assert np.allclose(dec(onnx_ops.Exp()(enc(x))), np.exp(x), atol=0.2)


def test_erf_module():
    import math

    x = RNG.uniform(-2.0, 2.0, size=(16,))
    ref = np.vectorize(math.erf)(x)
    np.testing.assert_allclose(dec(onnx_ops.Erf()(enc(x))), ref, atol=0.05)


# ---------------------------------------------------------------------------
# shape ops
# ---------------------------------------------------------------------------


def test_transpose_from_onnx():
    x = RNG.normal(size=(2, 3, 4))
    m = onnx_ops.Transpose.from_onnx({"perm": [2, 0, 1]})
    np.testing.assert_allclose(dec(m(enc(x))), x.transpose(2, 0, 1), atol=1e-3)


@pytest.mark.parametrize(
    "axes,shape,expect",
    [
        ([0], (1, 3, 4), (3, 4)),
        ([0, 2], (1, 3, 1, 4), (3, 4)),
        (None, (1, 3, 1), (3,)),
    ],
)
def test_squeeze(axes, shape, expect):
    x = RNG.normal(size=shape)
    m = onnx_ops.Squeeze.from_onnx({"axes": axes} if axes is not None else {})
    out = dec(m(enc(x)))
    assert out.shape == expect
    np.testing.assert_allclose(out, x.reshape(expect), atol=1e-3)


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
def test_unsqueeze(axis):
    x = RNG.normal(size=(3, 4))
    m = onnx_ops.Unsqueeze.from_onnx({"axes": [axis]})
    np.testing.assert_allclose(dec(m(enc(x))), np.expand_dims(x, axis), atol=1e-3)


@pytest.mark.parametrize(
    "starts,ends,axes",
    [
        ([1], [3], [0]),
        ([0, 1], [2, 3], [0, 1]),
        ([-2], [2**31], [1]),  # negative start + INT_MAX sentinel end
        ([1], [-1], None),
    ],
)
def test_slice_semantics(starts, ends, axes):
    x = RNG.normal(size=(4, 5))
    m = onnx_ops.Slice.from_onnx({"starts": starts, "ends": ends, "axes": axes})
    sl = [slice(None)] * 2
    for i, (s, e) in enumerate(zip(starts, ends)):
        ax = axes[i] if axes else i
        n = x.shape[ax]
        s2 = max(s + n, 0) if s < 0 else min(s, n)
        e2 = max(e + n, 0) if e < 0 else min(e, n)
        sl[ax] = slice(s2, e2)
    np.testing.assert_allclose(dec(m(enc(x))), x[tuple(sl)], atol=1e-3)


def test_slice_runtime_inputs():
    x = RNG.normal(size=(4, 5))
    m = onnx_ops.Slice(None, None)
    out = dec(m([enc(x), np.array([1]), np.array([3]), np.array([0])]))
    np.testing.assert_allclose(out, x[1:3], atol=1e-3)
    out5 = dec(
        m([enc(x), np.array([0]), np.array([2]), np.array([1]), np.array([1])])
    )
    np.testing.assert_allclose(out5, x[:, 0:2], atol=1e-3)
    with pytest.raises(ValueError):
        m([enc(x), np.array([0]), np.array([2]), np.array([1]), np.array([2])])


def test_expand():
    x = RNG.normal(size=(3, 1))
    m = onnx_ops.Expand.from_onnx({})
    out = dec(m([enc(x), np.array([3, 4])]))
    np.testing.assert_allclose(out, np.broadcast_to(x, (3, 4)), atol=1e-3)
    # target dim 1 broadcasts from the input (ONNX rule)
    out2 = dec(m([enc(x), np.array([1, 1])]))
    np.testing.assert_allclose(out2, np.broadcast_to(x, (3, 1)), atol=1e-3)


def test_shape_and_constantofshape():
    x = RNG.normal(size=(2, 5))
    shp = onnx_ops.Shape.from_onnx({})(enc(x))
    np.testing.assert_array_equal(np.asarray(shp), [2, 5])
    filled = onnx_ops.ConstantOfShape.from_onnx({"value": np.array([3.5])})(
        np.asarray(shp)
    )
    np.testing.assert_allclose(np.asarray(filled), np.full((2, 5), 3.5))


def test_constant_and_cast_and_range():
    c = onnx_ops.Constant.from_onnx({"value": np.arange(4.0)})
    np.testing.assert_allclose(np.asarray(c()), np.arange(4.0))
    # Cast is a no-op on encrypted tensors
    x = RNG.normal(size=(3,))
    m = onnx_ops.Cast.from_onnx({"to": 1})
    np.testing.assert_allclose(dec(m(enc(x))), x, atol=1e-3)
    assert np.asarray(m(np.arange(3).astype(np.int64))).dtype == np.float32
    r = onnx_ops.Range.from_onnx({})([np.array(1.0), np.array(7.0), np.array(2.0)])
    np.testing.assert_allclose(np.asarray(r), [1.0, 3.0, 5.0])


def test_concat_reshape_gather():
    a = RNG.normal(size=(2, 3))
    b = RNG.normal(size=(2, 2))
    m = onnx_ops.Concat.from_onnx({"axis": 1})
    np.testing.assert_allclose(
        dec(m([enc(a), enc(b)])), np.concatenate([a, b], 1), atol=1e-3
    )
    rs = onnx_ops.Reshape.from_onnx({})
    np.testing.assert_allclose(
        dec(rs([enc(a), np.array([3, 2])])), a.reshape(3, 2), atol=1e-3
    )
    g = onnx_ops.Gather.from_onnx({"axis": 1})
    np.testing.assert_allclose(
        dec(g([enc(a), np.array([2, 0])])), a[:, [2, 0]], atol=1e-3
    )
    # missing axis attribute defaults to axis 0, not flattened-take
    g0 = onnx_ops.Gather.from_onnx({})
    np.testing.assert_allclose(
        dec(g0([enc(a), np.array([1])])), a[[1]], atol=1e-3
    )


def test_gather_rejects_private_indices():
    a = RNG.normal(size=(4,))
    g = onnx_ops.Gather.from_onnx({"axis": 0})
    with pytest.raises(ValueError):
        g([enc(a), enc(np.array([1.0]), precision=0)])


def test_where_and_equal():
    a = RNG.normal(size=(6,))
    b = RNG.normal(size=(6,))
    cond = (a > b).astype(np.float64)
    m = onnx_ops.Where.from_onnx({})
    out = dec(m([enc(cond, precision=0), enc(a), enc(b)]))
    np.testing.assert_allclose(out, np.where(cond > 0, a, b), atol=0.01)
    eq = onnx_ops.Equal.from_onnx({})
    x = np.array([1.0, 2.0, 3.0])
    y = np.array([1.0, 5.0, 3.0])
    np.testing.assert_allclose(dec(eq([enc(x), enc(y)])), (x == y) * 1.0, atol=0.01)
    # shape mismatch returns False like the reference (module.py:1457)
    assert eq([enc(x), enc(RNG.normal(size=(2,)))]) is False


# ---------------------------------------------------------------------------
# pads, Gemm, MatMul, Conv
# ---------------------------------------------------------------------------


def test_constant_pads():
    x = RNG.normal(size=(2, 3))
    m = onnx_ops.ConstantPad1d(1, 0.0)
    out = dec(m(enc(x)))
    np.testing.assert_allclose(out, np.pad(x, [(0, 0), (1, 1)]), atol=1e-3)
    # runtime pads are torch-style (last dim first), passed through exactly
    # like the reference's _ConstantPad.forward (module.py:1790)
    m2 = onnx_ops._ConstantPad.from_onnx({"mode": b"constant"})
    out2 = dec(m2([enc(x), np.array([1, 0, 1, 0])]))
    assert out2.shape == (3, 4)
    np.testing.assert_allclose(out2, np.pad(x, [(1, 0), (1, 0)]), atol=1e-3)
    with pytest.raises(AssertionError):
        onnx_ops._ConstantPad.from_onnx({"mode": b"reflect"})


@pytest.mark.parametrize("transA,transB", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_gemm(transA, transB):
    a = RNG.normal(size=(3, 4) if not transA else (4, 3))
    b = RNG.normal(size=(4, 2) if not transB else (2, 4))
    c = RNG.normal(size=(3, 2))
    m = onnx_ops.Gemm.from_onnx(
        {"alpha": 0.5, "beta": 2.0, "transA": transA, "transB": transB}
    )
    ref = 0.5 * (a.T if transA else a) @ (b.T if transB else b) + 2.0 * c
    out = dec(m([enc(a), enc(b), enc(c)]))
    np.testing.assert_allclose(out, ref, atol=0.02)


def test_gemm_public_encrypted_mix():
    a = RNG.normal(size=(3, 4))
    b = RNG.normal(size=(4, 2))
    c = RNG.normal(size=(2,))
    m = onnx_ops.Gemm.from_onnx({})
    ref = a @ b + c
    np.testing.assert_allclose(dec(m([a, enc(b), enc(c)])), ref, atol=0.02)
    np.testing.assert_allclose(dec(m([enc(a), b, c])), ref, atol=0.02)


@pytest.mark.parametrize("mode", ["enc_enc", "enc_pub", "pub_enc"])
def test_matmul_batched(mode):
    a = RNG.normal(size=(2, 3, 4))
    b = RNG.normal(size=(2, 4, 5))
    m = onnx_ops.MatMul.from_onnx({})
    ea = enc(a) if mode != "pub_enc" else a
    eb = enc(b) if mode != "enc_pub" else b
    np.testing.assert_allclose(dec(m([ea, eb])), a @ b, atol=0.02)


@pytest.mark.parametrize("with_bias", [False, True])
def test_stateless_conv(with_bias):
    import torch

    x = RNG.normal(size=(1, 2, 6, 6))
    w = RNG.normal(size=(3, 2, 3, 3)) * 0.3
    b = RNG.normal(size=(3,))
    m = onnx_ops.Conv.from_onnx(
        {"strides": [2, 2], "pads": [1, 1, 1, 1], "dilations": [1, 1]}
    )
    ref = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w),
        torch.tensor(b) if with_bias else None, stride=2, padding=1,
    ).numpy()
    inputs = [enc(x), enc(w)] + ([enc(b)] if with_bias else [])
    np.testing.assert_allclose(dec(m(inputs)), ref, atol=0.05)


def test_conv1d_via_kernel_rank():
    import torch

    x = RNG.normal(size=(1, 2, 8))
    w = RNG.normal(size=(4, 2, 3)) * 0.3
    m = onnx_ops.Conv.from_onnx({"strides": [1], "pads": [0, 0]})
    ref = torch.nn.functional.conv1d(torch.tensor(x), torch.tensor(w)).numpy()
    np.testing.assert_allclose(dec(m([enc(x), enc(w)])), ref, atol=0.05)


def test_conv_asymmetric_pads_raise():
    with pytest.raises(NotImplementedError):
        onnx_ops.Conv.from_onnx({"pads": [1, 0, 0, 0]})


# ---------------------------------------------------------------------------
# reductions / pooling / normalization
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("keepdims", [0, 1])
def test_mean_sum_reduce(keepdims):
    x = RNG.normal(size=(3, 4, 5))
    m = onnx_ops.Mean.from_onnx({"axes": [1], "keepdims": keepdims})
    np.testing.assert_allclose(
        dec(m(enc(x))), x.mean(1, keepdims=bool(keepdims)), atol=0.01
    )
    s = onnx_ops.Sum.from_onnx({"axes": [0, 2], "keepdims": keepdims})
    np.testing.assert_allclose(
        dec(s(enc(x))), x.sum((0, 2), keepdims=bool(keepdims)), atol=0.05
    )


def test_global_average_pool():
    x = RNG.normal(size=(2, 3, 4, 5))
    m = onnx_ops.GlobalAveragePool.from_onnx({})
    np.testing.assert_allclose(
        dec(m(enc(x))), x.mean((2, 3), keepdims=True), atol=0.01
    )


def test_pool2d_from_onnx():
    import torch

    x = RNG.normal(size=(1, 2, 6, 6))
    avg = onnx_ops._Pool2d.from_onnx(
        "average", {"kernel_shape": [2, 2], "strides": [2, 2]}
    )
    ref = torch.nn.functional.avg_pool2d(torch.tensor(x), 2, 2).numpy()
    np.testing.assert_allclose(dec(avg(enc(x))), ref, atol=0.02)
    mx = onnx_ops._Pool2d.from_onnx(
        "max", {"kernel_shape": [3, 3], "strides": [1, 1], "pads": [1, 1, 1, 1]}
    )
    refm = torch.nn.functional.max_pool2d(
        torch.tensor(x), 3, 1, padding=1
    ).numpy()
    np.testing.assert_allclose(dec(mx(enc(x))), refm, atol=0.05)


def test_adaptive_pools():
    import torch

    x = RNG.normal(size=(1, 2, 6, 6))
    a = onnx_ops.AdaptiveAvgPool2d.from_onnx({"shape": [3, 3]})
    ref = torch.nn.functional.adaptive_avg_pool2d(torch.tensor(x), (3, 3)).numpy()
    np.testing.assert_allclose(dec(a(enc(x))), ref, atol=0.02)
    m = onnx_ops.AdaptiveMaxPool2d.from_onnx({"shape": [2, 2]})
    refm = torch.nn.functional.adaptive_max_pool2d(torch.tensor(x), (2, 2)).numpy()
    np.testing.assert_allclose(dec(m(enc(x))), refm, atol=0.05)


def test_batch_normalization_node():
    x = RNG.normal(size=(4, 3))
    w = RNG.uniform(0.5, 1.5, size=(3,))
    b = RNG.normal(size=(3,))
    mean = RNG.normal(size=(3,)) * 0.1
    # encrypted running stats normalize via the private inv_sqrt LUT; its
    # 1.0-wide haar cells put the cell-mean error at ~0.03 relative from
    # x=4 up (test_functions.py::test_inv_sqrt_domain), and the egk
    # probabilistic truncation can land an input in a neighboring cell, so
    # stay in [4, 16] and allow a stacked-error tolerance
    var = RNG.uniform(4.0, 16.0, size=(3,))
    m = onnx_ops.BatchNormalization.from_onnx({"epsilon": 1e-5})
    m.eval()
    out = dec(m([enc(x), enc(w), enc(b), enc(mean), enc(var)]))
    ref = w * (x - mean) / np.sqrt(var + 1e-5) + b
    np.testing.assert_allclose(out, ref, atol=0.2)


def test_layer_normalization_node():
    x = RNG.normal(size=(2, 6)) * 2
    w = RNG.uniform(0.5, 1.5, size=(6,))
    b = RNG.normal(size=(6,))
    m = onnx_ops.LayerNormalization.from_onnx({"epsilon": 1e-5})
    out = dec(m([enc(x), enc(w), enc(b)]))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = w * (x - mu) / np.sqrt(var + 1e-5) + b
    np.testing.assert_allclose(out, ref, atol=0.2)


def test_silu_alias_and_dropoutnd():
    x = RNG.normal(size=(8,))
    out = dec(onnx_ops.SILU.from_onnx({})(enc(x)))
    np.testing.assert_allclose(out, x / (1 + np.exp(-x)), atol=0.06)
    d = onnx_ops.Dropout2d.from_onnx({"ratio": 0.5})
    d.eval()
    xx = RNG.normal(size=(2, 4, 3, 3))
    np.testing.assert_allclose(dec(d(enc(xx))), xx, atol=0.01)
    d.train()
    out = dec(d(enc(np.ones((2, 8, 3, 3)))))
    # channel dropout: each (c) map is all-zero or all-scaled
    per_channel = out.reshape(2, 8, -1)
    zeroed = np.isclose(per_channel, 0, atol=0.01).all(-1)
    scaled = np.isclose(per_channel, 2.0, atol=0.05).all(-1)
    assert np.logical_or(zeroed, scaled).all()


# ---------------------------------------------------------------------------
# containers: Graph executor, ModuleList/Dict
# ---------------------------------------------------------------------------


def test_graph_diamond_and_reclamation():
    # x -> {sq, neg} -> add : a diamond; 'x' must survive until both uses ran
    g = onnx_ops.Graph(["x"], ["out"])
    g.add_module("sq", onnx_ops.Mul.from_onnx({}), ["x", "x"])
    g.add_module("neg", onnx_ops.Sub.from_onnx({}), ["sq", "x"])
    g.add_module("out", onnx_ops.Add.from_onnx({}), ["sq", "neg"])
    x = RNG.uniform(0.2, 1.0, size=(5,))
    ref = (x * x) + (x * x - x)
    np.testing.assert_allclose(dec(g(enc(x))), ref, atol=0.02)


def test_graph_multi_output_module():
    class SplitHalves(nn.Module):
        def forward(self, x):
            n = x.size(0)
            return x.narrow(0, 0, n // 2), x.narrow(0, n // 2, n - n // 2)

    g = onnx_ops.Graph(["x"], ["y"])
    sp = SplitHalves()
    g.add_module("split", sp, ["x"], output_names=["lo", "hi"])
    g.add_module("y", onnx_ops.Add.from_onnx({}), ["lo", "hi"])
    x = RNG.normal(size=(6,))
    np.testing.assert_allclose(dec(g(enc(x))), x[:3] + x[3:], atol=0.01)


def test_graph_plain_mode_matches_encrypted():
    g = onnx_ops.Graph(["x"], ["out"])
    g.add_module("e", onnx_ops.Exp.from_onnx({}), ["x"])
    g.add_module("out", onnx_ops.Mul.from_onnx({}), ["e", "x"])
    x = RNG.uniform(-1.0, 1.0, size=(7,))
    enc_out = dec(g(enc(x)))
    plain_out = dec(g(x))
    np.testing.assert_allclose(plain_out, np.exp(x) * x, atol=1e-6)
    np.testing.assert_allclose(enc_out, plain_out, atol=0.1)


def test_graph_disconnected_raises():
    g = onnx_ops.Graph(["x"], ["out"])
    g.add_module("out", onnx_ops.Add.from_onnx({}), ["x", "missing"])
    with pytest.raises(ValueError):
        g(enc(np.ones(3)))


def test_module_list_and_dict():
    ml = onnx_ops.ModuleList([nn.ReLU(), nn.Sigmoid()])
    assert len(ml) == 2
    assert isinstance(ml[0], nn.ReLU)
    assert isinstance(ml[0:1], onnx_ops.ModuleList)
    ml.append(nn.Tanh())
    assert len(list(iter(ml))) == 3
    md = onnx_ops.ModuleDict({"a": nn.ReLU()})
    md["b"] = nn.Tanh()
    assert "a" in md and "b" in md
    assert set(md.keys()) == {"a", "b"}
    with pytest.raises(NotImplementedError):
        ml(1)
    with pytest.raises(NotImplementedError):
        md(1)


def test_graph_encrypt_propagates_to_submodules():
    g = onnx_ops.Graph(["x"], ["lin"])
    lin = nn.Linear(4, 2)
    g.add_module("lin", lin, ["x"])
    g.encrypt(src=0)
    assert curl_tpu.is_encrypted_tensor(lin._parameters["weight"])
    x = RNG.normal(size=(3, 4))
    out = dec(g(enc(x)))
    assert out.shape == (3, 2)
    g.decrypt()
    assert not curl_tpu.is_encrypted_tensor(lin._parameters["weight"])
