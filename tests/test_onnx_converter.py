"""from_onnx conversion tests (reference model: test/test_onnx_converter.py):
torch model -> ONNX protobuf bytes (torch's own exporter, no onnx package;
utils/torch_onnx_export) -> onnx_lite wire-format parse -> Graph of
onnx_ops modules -> encrypted forward parity vs the torch original.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import curl_tpu
from curl_tpu.nn.converter import from_onnx
from curl_tpu.utils import onnx_lite
from curl_tpu.utils.torch_onnx_export import export_onnx_bytes


def _convert_and_compare(net, x, tol=0.05, encrypt=True):
    net = net.eval()
    data = export_onnx_bytes(net, torch.tensor(x, dtype=torch.float32))
    graph = from_onnx(data)
    if encrypt:
        graph.encrypt()
        out = graph(curl_tpu.cryptensor(x)).get_plain_text()
    else:
        out = np.asarray(graph(np.asarray(x, np.float64)))
    ref = net(torch.tensor(x, dtype=torch.float32)).detach().numpy()
    np.testing.assert_allclose(out, ref, atol=tol)
    return graph


def test_mlp_roundtrip():
    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(8, 16)
            self.fc2 = tnn.Linear(16, 4)

        def forward(self, x):
            return self.fc2(torch.relu(self.fc1(x))).softmax(-1)

    _convert_and_compare(Net(), np.random.default_rng(0).normal(size=(2, 8)))


def test_mlp_plaintext_graph():
    # Graph must also run un-encrypted (reference modules all do)
    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc = tnn.Linear(6, 3)

        def forward(self, x):
            return torch.sigmoid(self.fc(x))

    _convert_and_compare(
        Net(), np.random.default_rng(1).normal(size=(4, 6)), encrypt=False,
        tol=0.1,
    )


def test_convnet_roundtrip():
    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = tnn.Conv2d(1, 4, 3, padding=1)
            self.pool = tnn.MaxPool2d(2)
            self.fc = tnn.Linear(4 * 4 * 4, 5)

        def forward(self, x):
            h = self.pool(torch.relu(self.conv(x)))
            return self.fc(h.flatten(1))

    _convert_and_compare(
        Net(), np.random.default_rng(2).normal(size=(1, 1, 8, 8)) * 0.5,
        tol=0.1,
    )


def test_batchnorm_avgpool_roundtrip():
    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = tnn.Conv2d(2, 3, 3)
            self.bn = tnn.BatchNorm2d(3)
            self.pool = tnn.AvgPool2d(2)

        def forward(self, x):
            return self.pool(self.bn(self.conv(x)))

    _convert_and_compare(
        Net(), np.random.default_rng(3).normal(size=(1, 2, 6, 6)) * 0.5,
        tol=0.1,
    )


def test_onnx_lite_parses_initializers_and_attrs():
    net = tnn.Linear(3, 2)
    data = export_onnx_bytes(net, torch.randn(1, 3))
    model = onnx_lite.load_model(data)
    g = model.graph
    assert len(g.outputs) == 1
    # Gemm carries alpha/beta float attrs and weight/bias initializers
    gemm = [n for n in g.nodes if n.op_type == "Gemm"]
    assert gemm and set(gemm[0].attributes) >= {"alpha", "beta"}
    inits = {t.name: t.array for t in g.initializers}
    weights = [a for a in inits.values() if a.shape == (2, 3)]
    np.testing.assert_allclose(
        weights[0], net.weight.detach().numpy(), atol=1e-6
    )


def test_from_onnx_file_path(tmp_path):
    net = tnn.Linear(4, 2).eval()
    data = export_onnx_bytes(net, torch.randn(1, 4))
    p = tmp_path / "m.onnx"
    p.write_bytes(data)
    graph = from_onnx(str(p))
    graph.encrypt()
    x = np.random.default_rng(4).normal(size=(1, 4))
    out = graph(curl_tpu.cryptensor(x)).get_plain_text()
    ref = net(torch.tensor(x, dtype=torch.float32)).detach().numpy()
    np.testing.assert_allclose(out, ref, atol=0.05)
