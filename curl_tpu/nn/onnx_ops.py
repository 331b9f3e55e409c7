"""ONNX-style graph-op modules + the dataflow Graph container.

Rebuild of the reference's ONNX module surface (reference:
curl/nn/module.py:599-3136): every class the reference registers for its
onnx_converter graph building exists here with the same name, forward
contract, and a ``from_onnx(attributes)`` constructor. The executor
(`Graph`) is a dependency-counting dataflow evaluator with value
reclamation, like the reference's (module.py:607-761) — rebuilt for jnp
arrays / encrypted tensors.

These modules complement the torch.fx path in converter.py: fx covers
from_pytorch structurally; this surface covers from_onnx (converter.py
builds a Graph of these from a parsed ONNX ModelProto) and direct users
who hand-build ONNX-style graphs.
"""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

import curl_tpu

from .module import Module


def _is_enc(x):
    return curl_tpu.is_encrypted_tensor(x)


def _as_int_list(v):
    if v is None:
        return None
    if isinstance(v, (int, np.integer)):
        return [int(v)]
    return [int(x) for x in np.asarray(v).reshape(-1).tolist()]


def _scalar_or_tuple(vals):
    """[v] -> v, [v1, v2, ...] -> (v1, v2, ...): keep per-dim values intact
    instead of silently collapsing to element [0]."""
    vals = list(vals)
    return vals[0] if len(vals) == 1 else tuple(vals)


def _onnx_symmetric_pads(pads):
    """ONNX pads [x1_begin, x2_begin, ..., x1_end, x2_end] -> per-dim
    symmetric values; asymmetric padding is not supported by the conv/pool
    kernels, so raise rather than silently applying the begin value."""
    pads = _as_int_list(pads)
    if len(pads) % 2 == 0 and len(pads) > 1:
        half = len(pads) // 2
        begin, end = pads[:half], pads[half:]
        if begin != end:
            raise NotImplementedError(
                f"asymmetric ONNX pads {pads} are not supported"
            )
        return begin
    return pads


# ---------------------------------------------------------------------------
# containers (reference module.py:599-930)
# ---------------------------------------------------------------------------

class Container(Module):
    """Marker distinguishing containers from leaf modules."""


class Graph(Container):
    """Acyclic dataflow graph of named modules (reference module.py:607).

    ``_graph[name]`` lists the value names feeding module ``name``; a module
    may declare multiple outputs via ``_output_names``. Execution walks
    ready nodes and frees values whose consumers have all run.
    """

    def __init__(self, input_names, output_names, modules=None, graph=None):
        super().__init__()
        if not isinstance(input_names, (list, tuple)):
            input_names = [input_names]
        if not isinstance(output_names, (list, tuple)):
            output_names = [output_names]
        self.input_names = list(input_names)
        self.output_names = list(output_names)
        self._graph = dict(graph) if graph else {}
        if modules is not None:
            self._modules = OrderedDict(modules)

    def add_module(self, name, module, input_names=None, output_names=None):
        assert name not in self._graph, f"module {name} already exists"
        self.register_module(name, module)
        if input_names is not None:
            self._graph[name] = list(input_names)
        if output_names is not None:
            module._output_names = list(output_names)

    def forward(self, *args):
        assert len(args) == len(self.input_names), (
            f"expected {len(self.input_names)} inputs, got {len(args)}"
        )
        # un-encrypted inputs run through the same modules via PlainTensor
        # (the reference's modules execute on plain torch tensors natively;
        # module.py docstrings — here the adapter supplies that surface)
        plain_mode = not any(_is_enc(a) for a in args)
        if plain_mode:
            from .plain import wrap_plain

            args = tuple(wrap_plain(a) for a in args)
        values = dict(zip(self.input_names, args))

        # map every produced value name -> producing node
        producer = {}
        for node, module in self._modules.items():
            outs = getattr(module, "_output_names", None) or [node]
            for o in outs:
                producer[o] = node

        # remaining-consumer counts for memory reclamation
        consumers = {}
        for node, inputs in self._graph.items():
            for v in inputs:
                consumers[v] = consumers.get(v, 0) + 1
        for o in self.output_names:
            consumers[o] = consumers.get(o, 0) + 1

        done = set()

        def ready(node):
            return node not in done and all(
                v in values for v in self._graph.get(node, [])
            )

        progress = True
        while progress:
            progress = False
            for node in self._modules:
                if not ready(node):
                    continue
                module = self._modules[node]
                inputs = [values[v] for v in self._graph.get(node, [])]
                out = module(inputs if len(inputs) != 1 else inputs[0])
                if plain_mode:
                    from .plain import wrap_plain

                    out = (
                        tuple(wrap_plain(o) for o in out)
                        if isinstance(out, tuple)
                        else wrap_plain(out)
                    )
                outs = getattr(module, "_output_names", None) or [node]
                if len(outs) == 1:
                    values[outs[0]] = out
                else:
                    assert isinstance(out, tuple) and len(out) == len(outs)
                    values.update(zip(outs, out))
                done.add(node)
                progress = True
                # reclaim dead values
                for v in self._graph.get(node, []):
                    consumers[v] -= 1
                    if consumers.get(v) == 0 and v not in self.output_names:
                        values.pop(v, None)
                if all(o in values for o in self.output_names):
                    result = [values[o] for o in self.output_names]
                    return result[0] if len(result) == 1 else tuple(result)
        raise ValueError("nn.Graph.forward() failed — is the graph connected?")


class ModuleList(Module):
    """List container with registered submodules (reference module.py:794)."""

    def __init__(self, modules=None):
        super().__init__()
        if modules is not None:
            self.extend(modules)

    def __len__(self):
        return len(self._modules)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return ModuleList(list(self._modules.values())[idx])
        return list(self._modules.values())[idx]

    def __iter__(self):
        return iter(self._modules.values())

    def append(self, module):
        self.register_module(str(len(self._modules)), module)
        return self

    def extend(self, modules):
        for m in modules:
            self.append(m)
        return self

    def forward(self, *a, **k):
        raise NotImplementedError("ModuleList has no forward")


class ModuleDict(Module):
    """Dict container with registered submodules (reference module.py:857)."""

    def __init__(self, modules=None):
        super().__init__()
        if modules is not None:
            self.update(modules)

    def __len__(self):
        return len(self._modules)

    def __getitem__(self, key):
        return self._modules[key]

    def __setitem__(self, key, module):
        self.register_module(key, module)

    def __contains__(self, key):
        return key in self._modules

    def __iter__(self):
        return iter(self._modules)

    def keys(self):
        return self._modules.keys()

    def items(self):
        return self._modules.items()

    def values(self):
        return self._modules.values()

    def update(self, modules):
        for k, v in (modules.items() if hasattr(modules, "items") else modules):
            self.register_module(k, v)

    def forward(self, *a, **k):
        raise NotImplementedError("ModuleDict has no forward")


# ---------------------------------------------------------------------------
# stateless ONNX graph ops (reference module.py:964-1845)
# ---------------------------------------------------------------------------

class Identity(Module):
    """(reference module.py:964)"""

    def forward(self, x):
        return x

    @staticmethod
    def from_onnx(attributes=None):
        return Identity()


class Constant(Module):
    """Holds a plaintext constant; not encrypted by encrypt()
    (reference module.py:976)."""

    SUPPORTS_PLAINTEXT_INPUTS = True

    def __init__(self, value):
        super().__init__()
        self.value = jnp.asarray(np.asarray(value, dtype=np.float64))

    def forward(self, _input=None):
        return self.value

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        assert "value" in attributes, "Constant needs a value"
        return Constant(attributes["value"])

    def encrypt(self, mode=True, src=0):
        self.encrypted = mode
        return self


class ConstantOfShape(Module):
    """Constant-filled tensor of a runtime-supplied shape
    (reference module.py:1009)."""

    SUPPORTS_PLAINTEXT_INPUTS = True

    def __init__(self, value):
        super().__init__()
        self.value = float(np.asarray(value).reshape(-1)[0])

    def forward(self, size):
        size = _as_int_list(size)
        return jnp.full(tuple(size), self.value, dtype=jnp.float64)

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        assert "value" in attributes, "ConstantOfShape needs a value"
        return ConstantOfShape(attributes["value"])

    def encrypt(self, mode=True, src=0):
        self.encrypted = mode
        return self


class _Binary(Module):
    """Two-input elementwise op (reference Add/Sub/Mul/Div,
    module.py:1046-1100)."""

    _METHOD = None

    def forward(self, x):
        assert isinstance(x, (list, tuple)) and len(x) == 2, (
            f"{type(self).__name__} takes [a, b]"
        )
        a, b = x
        if not _is_enc(a) and _is_enc(b):
            # public-first ordering: route through the encrypted operand
            return _SWAPPED[self._METHOD](b, a)
        return getattr(a, self._METHOD)(b)

    @classmethod
    def from_onnx(cls, attributes=None):
        return cls()


_SWAPPED = {
    "add": lambda b, a: b.add(a),
    "mul": lambda b, a: b.mul(a),
    "sub": lambda b, a: b.neg().add(a),
    "div": lambda b, a: b.reciprocal().mul(a),
}


class Add(_Binary):
    _METHOD = "add"


class Sub(_Binary):
    _METHOD = "sub"


class Mul(_Binary):
    _METHOD = "mul"


class Div(_Binary):
    _METHOD = "div"


class Pow(Module):
    """(reference module.py:1103)"""

    def forward(self, x):
        base, power = x
        p = np.asarray(power).reshape(-1)
        if p.size == 1:
            power = float(p[0])
            if int(power) == power:
                power = int(power)
        return base.pow(power)

    @staticmethod
    def from_onnx(attributes=None):
        return Pow()


class Sqrt(Module):
    def forward(self, x):
        return x.sqrt()

    @staticmethod
    def from_onnx(attributes=None):
        return Sqrt()


class Exp(Module):
    def forward(self, x):
        return x.exp()

    @staticmethod
    def from_onnx(attributes=None):
        return Exp()


class Erf(Module):
    def forward(self, x):
        return x.erf()

    @staticmethod
    def from_onnx(attributes=None):
        return Erf()


class _Reduce(Module):
    """ReduceMean/ReduceSum base (reference module.py:1160)."""

    def __init__(self, dim, keepdim=False, reduction_fn="mean"):
        super().__init__()
        self.dim = tuple(_as_int_list(dim)) if dim is not None else None
        self.keepdim = keepdim
        self.reduction_fn = reduction_fn

    def forward(self, x):
        dim = self.dim if self.dim is None or len(self.dim) > 1 else self.dim[0]
        return getattr(x, self.reduction_fn)(dim, keepdim=self.keepdim)


class Mean(_Reduce):
    def __init__(self, dim, keepdim=False):
        super().__init__(dim, keepdim, "mean")

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        return Mean(attributes["axes"], bool(attributes.get("keepdims", 1)))


class Sum(_Reduce):
    def __init__(self, dim, keepdim=False):
        super().__init__(dim, keepdim, "sum")

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        return Sum(attributes["axes"], bool(attributes.get("keepdims", 1)))


class Transpose(Module):
    """ONNX permutation (reference module.py:1219)."""

    def __init__(self, perm):
        super().__init__()
        self.perm = _as_int_list(perm)

    def forward(self, x):
        assert x.dim() == len(self.perm)
        return x.permute(*self.perm)

    @staticmethod
    def from_onnx(attributes=None):
        return Transpose((attributes or {})["perm"])


class Squeeze(Module):
    """(reference module.py:1254)"""

    def __init__(self, dimension):
        super().__init__()
        dims = _as_int_list(dimension)
        self.dimension = dims[0] if dims and len(dims) == 1 else dims

    def forward(self, x):
        dims = self.dimension
        if dims is None or isinstance(dims, int):
            return x.squeeze(dims)
        # multiple axes: squeeze from the highest so indices stay valid
        ndim = len(x.shape)
        for d in sorted((d % ndim for d in dims), reverse=True):
            x = x.squeeze(d)
        return x

    @staticmethod
    def from_onnx(attributes=None):
        return Squeeze((attributes or {}).get("axes"))


class Unsqueeze(Module):
    """(reference module.py:1294)"""

    SUPPORTS_PLAINTEXT_INPUTS = True

    def __init__(self, dimension=None):
        super().__init__()
        dims = _as_int_list(dimension)
        self.dimension = dims[0] if dims else None

    def forward(self, x):
        if isinstance(x, (list, tuple)):
            x, dim = x
            dim = _as_int_list(dim)[0]
        else:
            dim = self.dimension
        if _is_enc(x):
            return x.unsqueeze(dim)
        return jnp.expand_dims(jnp.asarray(x), dim)

    @staticmethod
    def from_onnx(attributes=None):
        dims = (attributes or {}).get("axes", [None])
        return Unsqueeze(dims[0])


class Slice(Module):
    """ONNX opset-11 slice via repeated narrow (reference module.py:1335)."""

    def __init__(self, starts, ends, axes=None):
        super().__init__()
        self.starts = starts
        self.ends = ends
        self.axes = axes

    def forward(self, x):
        if isinstance(x, (list, tuple)):
            parts = list(x)
            steps = None
            axes = self.axes
            if len(parts) == 3:
                x, starts, ends = parts
            elif len(parts) == 4:
                x, starts, ends, axes = parts
            elif len(parts) == 5:
                x, starts, ends, axes, steps = parts
                if not np.all(np.asarray(steps) == 1):
                    raise ValueError("only step 1 is supported")
            else:
                raise ValueError("Slice takes 3-5 inputs")
            starts, ends = _as_int_list(starts), _as_int_list(ends)
            axes = _as_int_list(axes)
        else:
            starts, ends, axes = (
                _as_int_list(self.starts),
                _as_int_list(self.ends),
                _as_int_list(self.axes),
            )
        if axes is None:
            axes = list(range(len(starts)))
        out = x
        for start, end, axis in zip(starts, ends, axes):
            n = out.size(axis) if hasattr(out, "size") else out.shape[axis]
            n = int(n if not callable(n) else n)
            # ONNX semantics: negative indices count from the end; ends is
            # clamped to n (exporters emit INT64_MAX / -INT64_MAX sentinels)
            start, end = int(start), int(end)
            if start < 0:
                start = max(start + n, 0)
            else:
                start = min(start, n)
            if end < 0:
                end = max(end + n, 0)
            else:
                end = min(end, n)
            length = max(end - start, 0)
            out = out.narrow(int(axis), start, length)
        return out

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        return Slice(
            attributes.get("starts"),
            attributes.get("ends"),
            axes=attributes.get("axes"),
        )


class Expand(Module):
    """(reference module.py:1389)"""

    def forward(self, x):
        inp, shape = x
        shape = _as_int_list(shape)
        # ONNX broadcasts size-1 target dims from the input
        for i in range(len(shape)):
            if shape[i] == 1 and inp.size(i) > 1:
                shape[i] = inp.size(i)
        return inp.expand(*shape)

    @staticmethod
    def from_onnx(attributes=None):
        return Expand()


class Cast(Module):
    """No-op for encrypted tensors (reference module.py:1413)."""

    def __init__(self, dtype=None):
        super().__init__()
        self.dtype = dtype

    def forward(self, x):
        if _is_enc(x):
            return x
        arr = jnp.asarray(x)
        return arr.astype(self.dtype) if self.dtype is not None else arr

    @staticmethod
    def from_onnx(attributes=None):
        # ONNX TensorProto dtype codes for the types we keep distinct
        codes = {1: jnp.float32, 6: jnp.int32, 7: jnp.int64, 11: jnp.float64}
        to = (attributes or {}).get("to")
        return Cast(codes.get(int(to)) if to is not None else None)


class Range(Module):
    """(reference module.py:1435)"""

    SUPPORTS_PLAINTEXT_INPUTS = True

    def forward(self, x):
        if len(x) == 2:
            start, end, step = x[0], x[1], 1
        elif len(x) == 3:
            start, end, step = x
        else:
            raise ValueError("Range takes 2 or 3 inputs")
        return jnp.arange(float(start), float(end), float(step))

    @staticmethod
    def from_onnx(attributes=None):
        return Range()


class Equal(Module):
    """(reference module.py:1457)"""

    def forward(self, x):
        a, b = x
        if tuple(a.shape) != tuple(b.shape):
            return False
        return a.eq(b)

    @staticmethod
    def from_onnx(attributes=None):
        return Equal()


class Where(Module):
    """(reference module.py:1472)"""

    def forward(self, x):
        condition, a, b = x
        return curl_tpu.where(condition, a, b)

    @staticmethod
    def from_onnx(attributes=None):
        return Where()


class Shape(Module):
    """Returns the (public) shape vector (reference module.py:1529)."""

    SUPPORTS_PLAINTEXT_INPUTS = True

    def __init__(self, dim=None):
        super().__init__()
        self.dim = dim

    def forward(self, x, dim=None):
        dim = dim if dim is not None else self.dim
        shape = tuple(x.shape)
        if dim is None:
            return jnp.asarray(shape, dtype=jnp.int64)
        return jnp.asarray(shape[dim], dtype=jnp.int64)

    @staticmethod
    def from_onnx(attributes=None):
        return Shape()


class Concat(Module):
    """(reference module.py:1553)"""

    def __init__(self, dimension):
        super().__init__()
        self.dimension = dimension

    def forward(self, x):
        assert isinstance(x, (list, tuple)) and len(x) >= 1
        if not any(_is_enc(t) for t in x):
            return jnp.concatenate([jnp.asarray(t) for t in x], axis=self.dimension)
        return curl_tpu.cat(list(x), self.dimension)

    @staticmethod
    def from_onnx(attributes=None):
        return Concat((attributes or {})["axis"])


class Reshape(Module):
    """(reference module.py:1573)"""

    SUPPORTS_PLAINTEXT_INPUTS = True

    def __init__(self, shape=None):
        super().__init__()
        self.shape = shape

    def forward(self, x, shape=None):
        if isinstance(x, (list, tuple)) and len(x) == 2:
            x, shape = x
        shape = shape if shape is not None else self.shape
        assert shape is not None, "Reshape needs a shape"
        shape = _as_int_list(shape)
        if _is_enc(x):
            return x.reshape(*shape)
        return jnp.asarray(x).reshape(shape)

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        if "shape" in attributes:
            return Reshape(shape=attributes["shape"])
        return Reshape()


class Gather(Module):
    """Take along a dimension with public indices (reference
    module.py:1727)."""

    SUPPORTS_PLAINTEXT_INPUTS = True

    def __init__(self, dimension, indices=None):
        super().__init__()
        self.dimension = dimension
        self.indices = indices

    def forward(self, x):
        if not isinstance(x, (list, tuple)):
            tensor, indices = x, self.indices
        elif len(x) == 1:
            tensor, indices = x[0], self.indices
        else:
            tensor, indices = x
        if _is_enc(indices):
            raise ValueError("Gather needs public indices")
        indices = jnp.asarray(np.asarray(indices), dtype=jnp.int64)
        if _is_enc(tensor):
            return tensor.take(indices, self.dimension)
        if self.dimension is None:
            return jnp.take(jnp.asarray(tensor).reshape(-1), indices)
        return jnp.take(jnp.asarray(tensor), indices, axis=self.dimension)

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        # ONNX Gather's axis attribute is OPTIONAL with default 0 (a missing
        # axis must not become the flattened-take dimension=None path)
        return Gather(
            attributes.get("axis", 0), indices=attributes.get("shape")
        )


class _ConstantPad(Module):
    """(reference module.py:1790)"""

    def __init__(self, padding, value, ndims, mode="constant"):
        super().__init__()
        if isinstance(padding, int):
            padding = [padding, padding] * ndims
        self.padding = padding
        self.value = value
        self.mode = mode

    def forward(self, x):
        if isinstance(x, (list, tuple)):
            assert len(x) == 2, "input should be [tensor, pads]"
            x, padding = x[0], _as_int_list(x[1])
        else:
            padding = self.padding
        return x.pad(tuple(padding), value=self.value)

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        mode = attributes.get("mode", b"constant")
        assert mode in (b"constant", "constant"), "only constant padding"
        return _ConstantPad(None, 0, 0, mode="constant")


class ConstantPad1d(_ConstantPad):
    def __init__(self, padding, value, mode="constant"):
        super().__init__(padding, value, 1, mode=mode)


class ConstantPad2d(_ConstantPad):
    def __init__(self, padding, value, mode="constant"):
        super().__init__(padding, value, 2, mode=mode)


class ConstantPad3d(_ConstantPad):
    def __init__(self, padding, value, mode="constant"):
        super().__init__(padding, value, 3, mode=mode)


class Gemm(Module):
    """alpha * a @ b + beta * c (reference module.py:1845)."""

    def __init__(self, alpha=1.0, beta=1.0, trans_a=False, trans_b=False):
        super().__init__()
        self.alpha = alpha
        self.beta = beta
        self.trans_a = trans_a
        self.trans_b = trans_b

    def forward(self, x):
        a, b, c = x
        if self.trans_a:
            a = a.t() if _is_enc(a) else jnp.asarray(a).T
        if self.trans_b:
            b = b.t() if _is_enc(b) else jnp.asarray(b).T
        if _is_enc(a):
            out = a.matmul(b).mul(self.alpha)
        elif _is_enc(b):
            # public @ encrypted via (b^T @ a^T)^T
            out = b.t().matmul(jnp.asarray(a).T).t().mul(self.alpha)
        else:
            out = jnp.asarray(a) @ jnp.asarray(b) * self.alpha
        cm = c.mul(self.beta) if _is_enc(c) else jnp.asarray(c) * self.beta
        return out.add(cm) if _is_enc(out) else out + cm

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        return Gemm(
            alpha=attributes.get("alpha", 1.0),
            beta=attributes.get("beta", 1.0),
            trans_a=bool(attributes.get("transA", 0)),
            trans_b=bool(attributes.get("transB", 0)),
        )


class MatMul(Module):
    """(reference module.py:1917)"""

    def __init__(self, weight=None):
        super().__init__()
        if weight is not None:
            self.register_parameter("weight", weight)

    def forward(self, x):
        if "weight" in self._parameters:
            return x.matmul(self._parameters["weight"])
        assert isinstance(x, (list, tuple)) and len(x) == 2
        a, b = x
        if not _is_enc(a) and _is_enc(b):
            # public @ private: transpose to route through the private side
            bt = b.transpose(-2, -1)
            at = jnp.swapaxes(jnp.asarray(a), -2, -1)
            return bt.matmul(at).transpose(-2, -1)
        return a.matmul(b)

    @staticmethod
    def from_onnx(attributes=None):
        return MatMul()


class Conv(Module):
    """Stateless ONNX Conv: input [x, weight(, bias)] (reference
    module.py:2358-ish, the onnx Conv node)."""

    def __init__(self, stride=1, padding=0, dilation=1, groups=1):
        super().__init__()
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups

    def forward(self, x):
        if len(x) == 2:
            (inp, weight), bias = x, None
        else:
            inp, weight, bias = x
        # kernel rank decides 1d vs 2d: (O, I, K) vs (O, I, Kh, Kw)
        krank = len(weight.shape)
        conv_fn = "conv2d" if krank == 4 else "conv1d"
        out = getattr(inp, conv_fn)(
            weight,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )
        if bias is not None:
            b = bias
            for _ in range(krank - 2):
                b = b.unsqueeze(-1) if _is_enc(b) else jnp.expand_dims(b, -1)
            out = out.add(b)
        return out

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        strides = _as_int_list(attributes.get("strides", [1]))
        pads = _onnx_symmetric_pads(attributes.get("pads", [0]))
        dilations = _as_int_list(attributes.get("dilations", [1]))
        return Conv(
            stride=_scalar_or_tuple(strides),
            padding=_scalar_or_tuple(pads),
            dilation=_scalar_or_tuple(dilations),
            groups=int(attributes.get("group", 1)),
        )


class DropoutNd(Module):
    """Channel dropout (reference module.py:1656)."""

    def __init__(self, p=0.5, inplace=False):
        super().__init__()
        self.p = p

    def forward(self, x):
        from ..autograd import apply_function

        return apply_function(
            "_feature_dropout", x, self.p, self.training
        )

    @classmethod
    def from_onnx(cls, attributes=None):
        attributes = attributes or {}
        return cls(attributes.get("ratio", 0.5))


class Dropout2d(DropoutNd):
    pass


class Dropout3d(DropoutNd):
    pass


class GlobalAveragePool(Module):
    """(reference module.py:2878)"""

    def forward(self, x):
        assert x.dim() > 2, "needs more than two dimensions"
        out = x
        for dim in range(2, x.dim()):
            out = out.sum(dim, keepdim=True)
        spatial = int(np.prod(tuple(x.shape)[2:]))
        return out.div(spatial)

    @staticmethod
    def from_onnx(attributes=None):
        return GlobalAveragePool()


class AdaptiveAvgPool2d(Module):
    """(reference module.py:2774)"""

    def __init__(self, output_size=None):
        super().__init__()
        self.output_size = output_size

    def forward(self, x, output_size=None):
        output_size = output_size if output_size is not None else self.output_size
        assert output_size is not None, "AdaptiveAvgPool2d needs output_size"
        return x.adaptive_avg_pool2d(output_size)

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        if "shape" in attributes:
            return AdaptiveAvgPool2d(output_size=attributes["shape"])
        return AdaptiveAvgPool2d()


class AdaptiveMaxPool2d(Module):
    """(reference module.py:2826)"""

    def __init__(self, output_size=None):
        super().__init__()
        self.output_size = output_size

    def forward(self, x, output_size=None):
        output_size = output_size if output_size is not None else self.output_size
        assert output_size is not None, "AdaptiveMaxPool2d needs output_size"
        return x.adaptive_max_pool2d(output_size)

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        if "shape" in attributes:
            return AdaptiveMaxPool2d(output_size=attributes["shape"])
        return AdaptiveMaxPool2d()


class _Pool2d(Module):
    """avg/max pooling base (reference module.py:2624)."""

    def __init__(self, pool_type, kernel_size, stride=None, padding=0,
                 ceil_mode=False):
        super().__init__()
        self.pool_type = pool_type
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.ceil_mode = ceil_mode

    def forward(self, x):
        kwargs = {
            "stride": self.stride,
            "padding": self.padding,
            "ceil_mode": self.ceil_mode,
        }
        if self.pool_type == "average":
            return x.avg_pool2d(self.kernel_size, **kwargs)
        if self.pool_type == "max":
            return x.max_pool2d(self.kernel_size, **kwargs)
        raise ValueError(f"unknown pooling type {self.pool_type}")

    @staticmethod
    def from_onnx(pool_type, attributes=None):
        from .module import AvgPool2d, MaxPool2d

        attributes = attributes or {}
        kernel = _scalar_or_tuple(_as_int_list(attributes.get("kernel_shape", [2])))
        stride = _scalar_or_tuple(
            _as_int_list(attributes.get("strides", _as_int_list(kernel)))
        )
        padding = _scalar_or_tuple(_onnx_symmetric_pads(attributes.get("pads", [0])))
        ceil_mode = bool(attributes.get("ceil_mode", 0))
        cls = AvgPool2d if pool_type == "average" else MaxPool2d
        return cls(kernel, stride=stride, padding=padding, ceil_mode=ceil_mode)


class BatchNormalization(Module):
    """ONNX inference batchnorm: inputs [x, weight, bias, mean, var]
    (reference module.py:3047)."""

    def __init__(self, eps=1e-5, momentum=0.1):
        super().__init__()
        self.eps = eps
        self.momentum = momentum
        self.inv_var = None

    def forward(self, x):
        from ..autograd import apply_function

        inp, weight, bias, running_mean, running_var = x
        return apply_function(
            "batchnorm",
            inp,
            weight,
            bias,
            running_mean=running_mean,
            running_var=running_var,
            training=self.training,
            eps=self.eps,
            momentum=self.momentum,
            inv_var=self.inv_var,
        )

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        return BatchNormalization(
            eps=attributes.get("epsilon", 1e-5),
            momentum=attributes.get("momentum", 0.1),
        )


class LayerNormalization(Module):
    """ONNX layernorm over the last dims: inputs [x, weight, bias]
    (reference module.py:2903)."""

    def __init__(self, eps=1e-5):
        super().__init__()
        self.eps = eps

    def forward(self, x):
        from .module import layernorm

        inp, weight, bias = x
        dims = len(weight.shape)
        return layernorm(inp, weight, bias, eps=self.eps, dims=dims)

    @staticmethod
    def from_onnx(attributes=None):
        attributes = attributes or {}
        return LayerNormalization(eps=attributes.get("epsilon", 1e-5))


class SILU(Module):
    """ONNX-name alias of SiLU (reference module.py:2527)."""

    def forward(self, x):
        return x.silu()

    @staticmethod
    def from_onnx(attributes=None):
        return SILU()
