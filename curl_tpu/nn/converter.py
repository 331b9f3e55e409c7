"""PyTorch -> curl_tpu model conversion.

Parity scope: reference curl/nn/onnx_converter.py:42-66 (from_pytorch /
from_onnx). The reference round-trips through an ONNX export; this
environment has no onnx package, and a protobuf hop is unnecessary anyway —
``from_pytorch`` symbolically traces the torch model with torch.fx and maps
the resulting graph directly onto curl_tpu.nn modules and encrypted-tensor
ops. This covers arbitrary forward() control flow (ResNets, custom blocks),
not just Sequential containers.

``from_onnx`` parses the ONNX protobuf directly (utils/onnx_lite wire-format
reader — no onnx package needed) and builds a Graph of onnx_ops modules,
matching the reference's onnx path end to end.
"""

from __future__ import annotations

import operator
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from . import module as nn_mod
from .module import Module


def _np(t):
    return jnp.asarray(t.detach().cpu().numpy())


def _convert_leaf_module(tm):
    """Map a torch.nn leaf module to the equivalent curl_tpu.nn module."""
    import torch

    t = type(tm).__name__
    if t == "Linear":
        m = nn_mod.Linear(tm.in_features, tm.out_features, bias=tm.bias is not None)
        m._parameters["weight"] = _np(tm.weight)
        if tm.bias is not None:
            m._parameters["bias"] = _np(tm.bias)
        else:
            m._parameters.pop("bias", None)
        return m
    if t == "Conv2d":
        m = nn_mod.Conv2d(
            tm.in_channels, tm.out_channels, tm.kernel_size, stride=tm.stride,
            padding=tm.padding if not isinstance(tm.padding, str) else 0,
            dilation=tm.dilation, groups=tm.groups, bias=tm.bias is not None,
        )
        m._parameters["weight"] = _np(tm.weight)
        if tm.bias is not None:
            m._parameters["bias"] = _np(tm.bias)
        else:
            m._parameters.pop("bias", None)
        return m
    if t == "Conv1d":
        m = nn_mod.Conv1d(
            tm.in_channels, tm.out_channels, tm.kernel_size, stride=tm.stride,
            padding=tm.padding if not isinstance(tm.padding, str) else 0,
            dilation=tm.dilation, groups=tm.groups, bias=tm.bias is not None,
        )
        m._parameters["weight"] = _np(tm.weight)
        if tm.bias is not None:
            m._parameters["bias"] = _np(tm.bias)
        return m
    if t == "ReLU":
        return nn_mod.ReLU()
    if t == "ReLU6":
        return nn_mod.ReLU6()
    if t == "GELU":
        return nn_mod.GELU()
    if t == "SiLU":
        return nn_mod.SiLU()
    if t == "Sigmoid":
        return nn_mod.Sigmoid()
    if t == "Tanh":
        return nn_mod.Tanh()
    if t == "Hardtanh":
        return nn_mod.Hardtanh(tm.min_val, tm.max_val)
    if t == "Softmax":
        return nn_mod.Softmax(tm.dim if tm.dim is not None else -1)
    if t == "LogSoftmax":
        return nn_mod.LogSoftmax(tm.dim if tm.dim is not None else -1)
    if t == "Dropout":
        return nn_mod.Dropout(tm.p)
    if t == "Flatten":
        return nn_mod.Flatten(tm.start_dim, tm.end_dim)
    if t == "MaxPool2d":
        return nn_mod.MaxPool2d(tm.kernel_size, stride=tm.stride, padding=tm.padding)
    if t == "AvgPool2d":
        return nn_mod.AvgPool2d(tm.kernel_size, stride=tm.stride, padding=tm.padding)
    if t == "AdaptiveAvgPool2d":
        out_size = tm.output_size

        class _AdaptiveAvg(Module):
            def forward(self, x):
                return x.adaptive_avg_pool2d(out_size)

        return _AdaptiveAvg()
    if t in ("BatchNorm1d", "BatchNorm2d", "BatchNorm3d"):
        cls = getattr(nn_mod, t)
        m = cls(tm.num_features, eps=tm.eps, momentum=tm.momentum or 0.1)
        m._parameters["weight"] = _np(tm.weight)
        m._parameters["bias"] = _np(tm.bias)
        m._buffers["running_mean"] = _np(tm.running_mean)
        m._buffers["running_var"] = _np(tm.running_var)
        return m
    if t == "LayerNorm":
        m = nn_mod.LayerNorm(tuple(tm.normalized_shape), eps=tm.eps)
        m._parameters["weight"] = _np(tm.weight)
        m._parameters["bias"] = _np(tm.bias)
        return m
    if t == "Embedding":
        m = nn_mod.Embedding(tm.num_embeddings, tm.embedding_dim)
        m._parameters["weight"] = _np(tm.weight)
        return m
    if t == "Identity":
        class _Identity(Module):
            def forward(self, x):
                return x

        return _Identity()
    raise NotImplementedError(f"cannot convert torch module {t}")


def _fn_table():
    import torch
    import torch.nn.functional as F

    return {
        operator.add: lambda a, b: a.add(b) if hasattr(a, "add") else b.add(a),
        torch.add: lambda a, b: a.add(b) if hasattr(a, "add") else b.add(a),
        operator.sub: lambda a, b: a.sub(b) if hasattr(a, "sub") else (-b).add(a),
        torch.sub: lambda a, b: a.sub(b),
        operator.mul: lambda a, b: a.mul(b) if hasattr(a, "mul") else b.mul(a),
        torch.mul: lambda a, b: a.mul(b),
        operator.truediv: lambda a, b: a.div(b),
        torch.matmul: lambda a, b: a.matmul(b),
        torch.flatten: lambda a, s=0, e=-1: a.flatten(s, e),
        torch.relu: lambda a: a.relu(),
        F.relu: lambda a, inplace=False: a.relu(),
        F.gelu: lambda a, approximate="none": a.gelu(),
        F.silu: lambda a, inplace=False: a.silu(),
        torch.sigmoid: lambda a: a.sigmoid(),
        torch.tanh: lambda a: a.tanh(),
        F.softmax: lambda a, dim=-1, **kw: a.softmax(dim),
        F.log_softmax: lambda a, dim=-1, **kw: a.log_softmax(dim),
        F.dropout: lambda a, p=0.5, training=False, inplace=False: a.dropout(
            p=p, training=training
        ),
        F.max_pool2d: lambda a, k, stride=None, padding=0, **kw: a.max_pool2d(
            k, stride=stride, padding=padding
        ),
        F.avg_pool2d: lambda a, k, stride=None, padding=0, **kw: a.avg_pool2d(
            k, stride=stride, padding=padding
        ),
        torch.cat: None,   # handled specially (list arg)
        torch.stack: None,
    }


class GraphModule(Module):
    """curl_tpu module executing a converted torch.fx graph."""

    def __init__(self, fx_graph, converted_modules, attrs):
        super().__init__()
        self.graph = fx_graph
        for name, m in converted_modules.items():
            self.register_module(name.replace(".", "__"), m)
        self._converted_names = {n: n.replace(".", "__") for n in converted_modules}
        self._attrs = attrs

    def forward(self, *inputs):
        import torch

        fn_table = _fn_table()
        env: Dict[str, Any] = {}
        input_iter = iter(inputs)
        out = None
        for node in self.graph.nodes:
            if node.op == "placeholder":
                env[node.name] = next(input_iter)
            elif node.op == "get_attr":
                env[node.name] = self._attrs[node.target]
            elif node.op == "call_module":
                sub = self._modules[self._converted_names[node.target]]
                args = [self._resolve(a, env) for a in node.args]
                env[node.name] = sub(*args)
            elif node.op == "call_function":
                args = [self._resolve(a, env) for a in node.args]
                kwargs = {k: self._resolve(v, env) for k, v in node.kwargs.items()}
                if node.target in (torch.cat, torch.stack):
                    tensors = args[0]
                    dim = args[1] if len(args) > 1 else kwargs.get("dim", 0)
                    import curl_tpu

                    op = curl_tpu.cat if node.target is torch.cat else curl_tpu.stack
                    env[node.name] = op(list(tensors), dim=dim)
                elif node.target in fn_table and fn_table[node.target] is not None:
                    env[node.name] = fn_table[node.target](*args, **kwargs)
                elif node.target is getattr:
                    env[node.name] = getattr(*args)
                else:
                    raise NotImplementedError(
                        f"cannot convert function {node.target}"
                    )
            elif node.op == "call_method":
                args = [self._resolve(a, env) for a in node.args]
                kwargs = {k: self._resolve(v, env) for k, v in node.kwargs.items()}
                obj = args[0]
                name = node.target
                if name == "size":
                    env[node.name] = obj.size(*args[1:])
                elif name in ("view", "reshape"):
                    env[node.name] = obj.view(*args[1:])
                elif hasattr(obj, name):
                    env[node.name] = getattr(obj, name)(*args[1:], **kwargs)
                else:
                    raise NotImplementedError(f"cannot convert method {name}")
            elif node.op == "output":
                out = self._resolve(node.args[0], env)
        return out

    def _resolve(self, arg, env):
        import torch.fx

        if isinstance(arg, torch.fx.Node):
            return env[arg.name]
        if isinstance(arg, (list, tuple)):
            return type(arg)(self._resolve(a, env) for a in arg)
        return arg


import torch  # noqa: E402  (required at module scope for fx.Node resolution)


def from_pytorch(model, dummy_input=None):
    """Convert a torch.nn model to an encryptable curl_tpu module.

    Fast path: known containers (Sequential of leaf modules) convert
    structurally. General path: torch.fx symbolic trace -> GraphModule.
    """
    import torch as _torch
    import torch.fx as fx

    model = model.eval()

    if isinstance(model, _torch.nn.Sequential):
        try:
            return nn_mod.Sequential(
                *[_convert_leaf_module(m) for m in model]
            )
        except NotImplementedError:
            pass

    try:
        traced = fx.symbolic_trace(model)
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            f"torch.fx could not trace model for conversion: {e}"
        ) from e

    converted = {}
    for name, sub in traced.named_modules():
        if name == "":
            continue
        if len(list(sub.children())) == 0:
            try:
                converted[name] = _convert_leaf_module(sub)
            except NotImplementedError:
                pass  # may be an unused submodule; graph will fail if used

    attrs = {}
    for node in traced.graph.nodes:
        if node.op == "get_attr":
            target = node.target
            obj = traced
            for part in target.split("."):
                obj = getattr(obj, part)
            attrs[target] = _np(obj)

    return GraphModule(traced.graph, converted, attrs)


class _OnnxParameter(nn_mod.Module):
    """Graph node holding one weight tensor (the reference adds
    module.Parameter nodes for every initializer,
    onnx_converter.py:175-177). Encryptable like any parameter."""

    def __init__(self, value):
        super().__init__()
        self.register_parameter("data", jnp.asarray(np.asarray(value, np.float64)))

    def forward(self, _input=None):
        return self._parameters["data"]


def _onnx_op_class(op_type, attributes):
    """ONNX op_type -> curl_tpu.nn module constructor
    (reference onnx_converter.py:150-161, 252-258)."""
    from . import onnx_ops

    # names that differ between ONNX and the module surface
    renamed = {
        "AveragePool": lambda a: onnx_ops._Pool2d.from_onnx("average", a),
        "MaxPool": lambda a: onnx_ops._Pool2d.from_onnx("max", a),
        "Pad": onnx_ops._ConstantPad.from_onnx,
        "ReduceMean": onnx_ops.Mean.from_onnx,
        "ReduceSum": onnx_ops.Sum.from_onnx,
        "Relu": lambda a: nn_mod.ReLU(),
        "Sigmoid": lambda a: nn_mod.Sigmoid(),
        "Tanh": lambda a: nn_mod.Tanh(),
        "Gelu": lambda a: nn_mod.GELU(),
        "Softmax": lambda a: nn_mod.Softmax((a or {}).get("axis", -1)),
        "LogSoftmax": lambda a: nn_mod.LogSoftmax((a or {}).get("axis", -1)),
        "Flatten": lambda a: nn_mod.Flatten((a or {}).get("axis", 1)),
        "Dropout": lambda a: nn_mod.Dropout((a or {}).get("ratio", 0.5)),
        "Clip": lambda a: nn_mod.Hardtanh(
            (a or {}).get("min", -1.0), (a or {}).get("max", 1.0)
        ),
    }
    if op_type in renamed:
        return lambda attributes=None: renamed[op_type](attributes)
    cls = getattr(onnx_ops, op_type, None)
    if cls is not None and hasattr(cls, "from_onnx"):
        return cls.from_onnx
    raise ValueError(f"unsupported ONNX op {op_type}")


def from_onnx(onnx_string_or_file):
    """Convert a serialized ONNX model to an encryptable Graph
    (reference: curl/nn/onnx_converter.py:42-66). The protobuf is decoded
    by utils/onnx_lite — no onnx package needed."""
    from ..utils import onnx_lite
    from .onnx_ops import Graph

    model = onnx_lite.load_model(onnx_string_or_file)
    graph = model.graph
    init_names = {t.name for t in graph.initializers}
    input_names = [n for n in graph.inputs if n not in init_names]
    assert len(graph.outputs) == 1, "only one output per model supported"

    g = Graph(input_names, graph.outputs[0])
    for tensor in graph.initializers:
        g.add_module(tensor.name, _OnnxParameter(tensor.array), [])
    for node in graph.nodes:
        ctor = _onnx_op_class(node.op_type, node.attributes)
        module = ctor(attributes=node.attributes)
        outputs = list(node.outputs)
        if node.op_type == "Dropout":
            outputs = outputs[:1]  # drop the mask output
        g.add_module(
            outputs[0], module, list(node.inputs), output_names=outputs
        )
    # unwrap single-module graphs as the reference does
    # (onnx_converter.py:221-229)
    if len(g._modules) == 1:
        return next(iter(g._modules.values()))
    return g


def from_tensorflow(*a, **k):
    raise NotImplementedError("tensorflow conversion is not supported")
