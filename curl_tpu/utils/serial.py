"""Restricted deserialization for object channels (reference:
curl/common/serial.py:42-120).

Tensor traffic in curl_tpu is raw arrays (npz / device buffers), never
pickled objects — but config/metadata exchange and the tuple-request trace
files use pickle, so the same allowlist discipline applies."""

from __future__ import annotations

import builtins
import io
import pickle

_SAFE_CLASSES = {
    ("builtins", "dict"),
    ("builtins", "list"),
    ("builtins", "tuple"),
    ("builtins", "set"),
    ("builtins", "str"),
    ("builtins", "int"),
    ("builtins", "float"),
    ("builtins", "bool"),
    ("builtins", "bytes"),
    ("builtins", "complex"),
    ("collections", "OrderedDict"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("curl_tpu.mpc.provider.provider", "TupleRequest"),
    # pickled jax treedefs (tuple-cache persistence) reference exactly these:
    ("jaxlib._jax.pytree", "PyTreeDef"),
    ("jaxlib.xla_extension.pytree", "PyTreeDef"),
    ("jax._src.tree_util", "default_registry"),
    ("curl_tpu.mpc.primitives.arithmetic", "ArithmeticSharedTensor"),
    ("curl_tpu.mpc.primitives.binary", "BinarySharedTensor"),
}


def register_safe_class(cls):
    """Allowlist a class for restricted unpickling (serial.py:34)."""
    _SAFE_CLASSES.add((cls.__module__, cls.__name__))
    return cls


class RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if (module, name) in _SAFE_CLASSES:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"class {module}.{name} is not in the unpickling allowlist"
        )


def restricted_loads(data: bytes):
    return RestrictedUnpickler(io.BytesIO(data)).load()
