"""Export a torch.nn.Module to ONNX bytes without the `onnx` package.

torch's TorchScript-based exporter serializes the ModelProto itself (C++),
but its final post-processing step (`_add_onnxscript_fn`) imports `onnx`
just to scan the graph for custom onnxscript functions — and re-serializes
only when it finds any. Standard opset-11 exports (everything the
reference's converter handles, curl/nn/onnx_converter.py:164-199) contain
none, so a stand-in whose `load_model_from_string` returns an empty graph
makes that step a no-op that passes the original bytes through unchanged.

This enables the full torch -> ONNX -> `curl_tpu.nn.from_onnx` path in
environments without onnx installed (like this one).
"""

from __future__ import annotations

import io
import sys
import types
from contextlib import contextmanager


class _EmptyGraph:
    node = ()


class _PassthroughModel:
    graph = _EmptyGraph()
    functions = []


@contextmanager
def _onnx_standin():
    """Temporarily provide a minimal `onnx` module if none is installed."""
    if "onnx" in sys.modules:
        yield
        return
    mod = types.ModuleType("onnx")
    mod.load_model_from_string = lambda data: _PassthroughModel()
    sys.modules["onnx"] = mod
    try:
        yield
    finally:
        if sys.modules.get("onnx") is mod:
            del sys.modules["onnx"]


def export_onnx_bytes(model, args, **kwargs) -> bytes:
    """torch.onnx.export to an in-memory ONNX protobuf (opset 11, like the
    reference's _export_pytorch_model, onnx_converter.py:139-161)."""
    import torch

    kwargs.setdefault("opset_version", 11)
    kwargs.setdefault("do_constant_folding", False)
    buf = io.BytesIO()
    was_training = getattr(model, "training", False)
    model.eval()
    try:
        with _onnx_standin():
            torch.onnx.export(model, args, buf, dynamo=False, **kwargs)
    finally:
        if was_training:
            model.train()
    return buf.getvalue()
