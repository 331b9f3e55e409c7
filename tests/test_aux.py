"""Aux subsystem tests: DP split training, run_multiprocess decorator,
debug validation mode, torch.fx converter, base OT, serialization,
save/load (parity scope: reference test_privacy_models / test_context /
test_debug / test_onnx_converter / test_baseOT / test_crypten)."""

import numpy as np
import pytest

import curl_tpu
from conftest import reinit


def test_run_multiprocess_decorator():
    from curl_tpu.mpc import run_multiprocess

    @run_multiprocess(world_size=3)
    def protocol():
        x = curl_tpu.cryptensor(np.array([2.0, 3.0]))
        return x.mul(2).get_plain_text()

    result = protocol()
    assert len(result) == 3
    np.testing.assert_allclose(result[0], [4.0, 6.0], atol=1e-3)
    reinit(world_size=2)


def test_dp_split_layer_estimation():
    import torch
    from curl_tpu.nn import DPSplitModel

    reinit(world_size=2)
    tm = torch.nn.Sequential(
        torch.nn.Linear(4, 6), torch.nn.ReLU(), torch.nn.Linear(6, 1)
    )
    dp = DPSplitModel(tm, feature_src=0, label_src=1,
                      noise_magnitude=0.01).attach_hooks()
    X = torch.randn(12, 4)
    y = (X.sum(dim=1, keepdim=True) > 0).float().numpy()
    dp.forward(X)
    dp.compute_loss(y)
    dp.backward()
    assert all(p.grad is not None for p in tm.parameters())


def test_dp_split_full_jacobian():
    import torch
    from curl_tpu.nn import DPSplitModel

    reinit(world_size=2)
    tm = torch.nn.Linear(3, 1)
    with curl_tpu.cfg.temp_override({"nn.dpsmpc.protocol": "full_jacobian"}):
        dp = DPSplitModel(tm, feature_src=0, label_src=1)
        X = torch.randn(5, 3)
        y = np.ones((5, 1))
        dp.forward(X)
        dp.compute_loss(y)
        dp.backward()
    assert tm.weight.grad is not None
    # gradient should roughly match plaintext BCE-with-logits gradient
    logits = tm(X)
    probs = torch.sigmoid(logits)
    ref = ((probs - torch.tensor(y).float()).T @ X / y.size) .detach().numpy()
    np.testing.assert_allclose(tm.weight.grad.numpy(), ref, atol=0.05)


def test_debug_validation_mode():
    from curl_tpu import debug

    reinit(world_size=2)
    x = curl_tpu.cryptensor(np.array([1.0, 2.0, 3.0]))
    with debug.validate_correctness(tolerance=0.5):
        _ = x.relu()
        _ = x.exp()


def test_debug_validation_catches_mismatch():
    from curl_tpu import debug

    reinit(world_size=2)
    x = curl_tpu.cryptensor(np.array([1.0, 2.0]))
    # sabotage the plaintext equivalence table to force a failure
    orig = debug._PLAINTEXT_EQUIV["relu"]
    debug._PLAINTEXT_EQUIV["relu"] = lambda v: v + 100
    try:
        with pytest.raises(ValueError):
            with debug.validate_correctness(tolerance=0.5):
                x.relu()
    finally:
        debug._PLAINTEXT_EQUIV["relu"] = orig


def test_from_pytorch_sequential():
    import torch
    from curl_tpu import nn

    reinit(world_size=2)
    tm = torch.nn.Sequential(
        torch.nn.Linear(4, 6), torch.nn.ReLU(), torch.nn.Linear(6, 2)
    ).double().eval()
    x = np.random.default_rng(0).normal(size=(3, 4))
    ref = tm(__import__("torch").tensor(x)).detach().numpy()
    cm = nn.from_pytorch(tm)
    cm.encrypt(src=0)
    out = cm(curl_tpu.cryptensor(x)).get_plain_text()
    np.testing.assert_allclose(out, ref, atol=0.02)


def test_base_ot():
    from curl_tpu.mpc.primitives.ot import BaseOT

    msgs = [(b"m0-000000", b"m1-111111")] * 4
    bits = [0, 1, 1, 0]
    got = BaseOT.transfer(msgs, bits)
    expected = [m[b] for m, b in zip(msgs, bits)]
    assert got == expected


def test_restricted_unpickler():
    import pickle

    from curl_tpu.utils.serial import restricted_loads

    data = pickle.dumps({"a": [1, 2.0, "x"]})
    assert restricted_loads(data) == {"a": [1, 2.0, "x"]}

    class Evil:
        pass

    with pytest.raises(Exception):
        restricted_loads(pickle.dumps(Evil()))


def test_save_load_roundtrip(tmp_path):
    reinit(world_size=2)
    x = curl_tpu.cryptensor(np.array([1.5, -2.5]))
    path = str(tmp_path / "enc.npz")
    curl_tpu.save(x, path)
    loaded = curl_tpu.load(path)
    np.testing.assert_allclose(loaded.get_plain_text(), [1.5, -2.5], atol=1e-3)


def test_load_from_party(tmp_path):
    reinit(world_size=2)
    arr = np.array([3.0, 4.0, 5.0])
    p = str(tmp_path / "plain.npy")
    curl_tpu.save_from_party(arr, p, src=0)
    enc = curl_tpu.load_from_party(p, src=0)
    np.testing.assert_allclose(enc.get_plain_text(), arr, atol=1e-3)


def test_cosine_similarity():
    from curl_tpu.nn.distances import CosineSimilarity

    reinit(world_size=2)
    rng = np.random.default_rng(3)
    a = rng.normal(size=(4, 6))
    b = rng.normal(size=(4, 6))
    out = CosineSimilarity(dim=1)(
        curl_tpu.cryptensor(a), curl_tpu.cryptensor(b)
    ).get_plain_text()
    ref = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_tensorboard_dot():
    from curl_tpu import nn
    from curl_tpu.nn.tensorboard import graph_to_dot

    m = nn.Sequential(nn.Linear(3, 4), nn.ReLU())
    dot = graph_to_dot(m)
    assert "digraph" in dot and "Linear" in dot


def test_get_communication_stats():
    """Round/byte counters readable as a dict (Tutorial 5 surface)."""
    import curl_tpu
    from curl_tpu import comm

    reinit(world_size=2)
    comm.reset_communication_stats()
    base = comm.get_communication_stats()
    assert base["rounds"] == 0 and base["bytes"] == 0 and base["calls"] == {}

    x = curl_tpu.cryptensor([1.0, -2.0, 3.0])
    (x * x).get_plain_text()
    stats = comm.get_communication_stats()
    assert stats["rounds"] > 0 and stats["bytes"] > 0
    assert any(stats["calls"].values())
    # snapshot is a copy, not a live view
    stats["calls"]["bogus"] = 99
    assert "bogus" not in comm.get_communication_stats()["calls"]


def test_cryptensor_requires_grad_kwarg():
    """cryptensor(..., requires_grad=True) marks an autograd leaf
    (reference CrypTensor constructor surface; Tutorial 7)."""
    import curl_tpu

    reinit(world_size=2)
    x = curl_tpu.cryptensor([[1.0, 2.0], [3.0, -1.0]], requires_grad=True)
    assert x.requires_grad
    y = x.square().sum()
    y.backward()
    np.testing.assert_allclose(
        x.grad.get_plain_text(), 2 * np.array([[1.0, 2.0], [3.0, -1.0]]),
        atol=0.02,
    )
    z = curl_tpu.cryptensor([1.0])
    assert not getattr(z, "requires_grad", False)


def test_dashboard_generator(tmp_path):
    """benchmarks/dashboard.py renders a self-contained HTML from the
    in-repo result files (reference surface: benchmarks/dash_app)."""
    import json
    import os
    import re
    import subprocess
    import sys

    out = tmp_path / "dash.html"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "benchmarks", "dashboard.py"),
         "--out", str(out)],
        capture_output=True, text=True, check=True,
    )
    assert "wrote" in r.stdout
    src = out.read_text()
    m = re.search(r"const DATA = (.*?);\n", src, re.S)
    data = json.loads(m.group(1))
    assert "history" in data and "func_snapshots" in data
    # pre-timing-fix runs must carry honest=False so the UI excludes them
    for run in data["history"]:
        assert run["honest"] == ("timing" in json.dumps(run) or run["honest"])
    assert all(isinstance(r0["honest"], bool) for r0 in data["history"])
