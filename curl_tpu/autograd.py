"""Define-by-run autograd over encrypted tensors.

Rebuild of the reference's autograd (reference: curl/cryptensor.py:216-459 +
curl/gradients.py:22-2161). Backward formulas are themselves MPC programs —
every gradient multiplication is a Beaver round — so the tape replays
protocol ops, exactly as the reference does.

Design differences from the reference:

  * No __getattribute__ interposition. ``install_autograd(cls)`` wraps each
    registered method on the tensor class with a dispatcher that runs the
    AutogradFunction when grad mode is on and any input requires grad.
  * Works identically for the eager CrypTensor (Python-time tape) and the
    per-party MPCTensor inside a jit trace (tape built at trace time, the
    whole forward+backward compiles into one XLA program — the TPU-native
    way to train under MPC).
"""

from __future__ import annotations

import math
import threading

import jax.numpy as jnp
import numpy as np

_grad_mode = threading.local()


def is_grad_enabled():
    return getattr(_grad_mode, "enabled", True)


class no_grad:
    def __enter__(self):
        self.prev = is_grad_enabled()
        _grad_mode.enabled = False
        return self

    def __exit__(self, *exc):
        _grad_mode.enabled = self.prev

    def __call__(self, fn):
        def wrapped(*a, **k):
            with no_grad():
                return fn(*a, **k)

        return wrapped


class enable_grad:
    def __enter__(self):
        self.prev = is_grad_enabled()
        _grad_mode.enabled = True
        return self

    def __exit__(self, *exc):
        _grad_mode.enabled = self.prev


FUNCTION_REGISTRY = {}


def register_function(name):
    def wrap(cls):
        FUNCTION_REGISTRY[name] = cls
        return cls

    return wrap


class AutogradContext:
    """(reference gradients.py:108)"""

    def __init__(self):
        self.context = []
        self.non_differentiable = []

    def save_for_backward(self, value):
        self.context.append(value)

    def save_multiple_for_backward(self, values):
        self.context.extend(values)

    def mark_non_differentiable(self, non_diff):
        if not isinstance(non_diff, list):
            non_diff = [non_diff]
        self.non_differentiable.extend(id(x) for x in non_diff)

    def is_differentiable(self, value):
        return id(value) not in self.non_differentiable

    @property
    def saved_tensors(self):
        return self.context


class AutogradFunction:
    differentiable = True

    @staticmethod
    def forward(ctx, *args, **kwargs):
        raise NotImplementedError

    @staticmethod
    def backward(ctx, grad_output):
        raise NotImplementedError


def _is_tensor_like(x):
    # probe the CLASS, not the instance: share/mpc are properties on the
    # tensor types, and executing them here (hasattr(x, ...) would) can
    # require a party context this dispatch point does not have
    t = type(x)
    return hasattr(t, "share") or hasattr(t, "mpc")


def _encrypt_like(tensor, value):
    """Encrypt a public array as the same tensor kind as `tensor`."""
    import curl_tpu

    if isinstance(tensor, curl_tpu.CrypTensor):
        return curl_tpu.cryptensor(value)
    from .mpc.mpc import MPCTensor

    return MPCTensor.encrypt(value, src=0)


def _requires_grad(args):
    for a in args:
        if _is_tensor_like(a):
            if getattr(a, "requires_grad", False):
                return True
        elif isinstance(a, (list, tuple)):
            if any(
                getattr(t, "requires_grad", False)
                for t in a
                if _is_tensor_like(t)
            ):
                return True
    return False


class _Node:
    """A backward-graph node: grad_fn + ctx + input refs."""

    __slots__ = ("fn", "ctx", "inputs", "outputs_count", "grads_received", "grad_acc")

    def __init__(self, fn, ctx, inputs):
        self.fn = fn
        self.ctx = ctx
        self.inputs = inputs


def _wrap_method(cls, name, plain_method):
    grad_cls = FUNCTION_REGISTRY[name]

    def dispatched(self, *args, **kwargs):
        if not is_grad_enabled() or not (
            getattr(self, "requires_grad", False) or _requires_grad(args)
        ):
            return plain_method(self, *args, **kwargs)
        return apply_function(name, self, *args, **kwargs)

    dispatched.__name__ = name
    setattr(cls, name, dispatched)


def _reject_compressed_grads(args):
    """Seed-compressed shares are inference-only: a compressed tensor that
    REQUIRES GRAD entering the tape would produce silently wrong gradients
    (the PRG-expanded share has no materialized storage to accumulate
    into; mpc/primitives/compressed.py documents the 2PC/inference scope).
    Forward use of compressed weights with requires_grad=False stays legal
    (grads flow to the other operands only)."""
    from .mpc.primitives.compressed import SeedCompressedArithmetic

    def check(a):
        if not getattr(a, "requires_grad", False):
            return
        t = getattr(a, "_tensor", a)
        t = getattr(t, "_tensor", t)  # CrypTensor -> MPCTensor -> shared
        if isinstance(t, SeedCompressedArithmetic):
            raise RuntimeError(
                "backward through seed-compressed shares is unsupported: "
                "they are inference-only (2PC). Encrypt the parameters "
                "with seed_compress=False (materialized shares) to train."
            )

    for a in args:
        if _is_tensor_like(a):
            check(a)
        elif isinstance(a, (list, tuple)):
            for t in a:
                if _is_tensor_like(t):
                    check(t)


def apply_function(name, *args, **kwargs):
    """Run a registered AutogradFunction and record the tape node."""
    _reject_compressed_grads(args)
    grad_cls = FUNCTION_REGISTRY[name]
    ctx = AutogradContext()
    with no_grad():
        result = grad_cls.forward(ctx, *args, **kwargs)
    tensor_inputs = []
    for a in args:
        if _is_tensor_like(a):
            tensor_inputs.append(a)
        elif isinstance(a, (list, tuple)):
            # cat/stack take a sequence of tensors: each element is a
            # distinct tape input receiving its own grad slice
            tensor_inputs.extend(t for t in a if _is_tensor_like(t))
    node = _Node(grad_cls, ctx, tensor_inputs)
    multi = isinstance(result, (tuple, list))
    outs = list(result) if multi else [result]
    for i, out in enumerate(outs):
        if ctx.is_differentiable(out):
            out.requires_grad = True
            out.grad_fn = node
            out.grad_output_index = i
            out.grad_fn_outputs = len(outs) if multi else 1
    return result


def backward(tensor, grad_input=None):
    """Reverse-mode pass (reference cryptensor.py:216-282).

    Topological traversal with gradient accumulation at fan-out points.
    """
    if grad_input is None:
        ones = jnp.ones(tensor.shape) if tensor.shape else jnp.ones(())
        grad_input = _encrypt_like(tensor, ones)
    elif not _is_tensor_like(grad_input):
        grad_input = _encrypt_like(tensor, jnp.asarray(grad_input))

    # 1. collect the graph & count how many grads each tensor expects
    expected = {}
    visited = set()
    stack = [tensor]
    order = []
    while stack:
        t = stack.pop()
        if id(t) in visited:
            continue
        visited.add(id(t))
        order.append(t)
        node = getattr(t, "grad_fn", None)
        if node is not None:
            for inp in node.inputs:
                expected[id(inp)] = expected.get(id(inp), 0)
                stack.append(inp)

    received = {}
    grads = {id(tensor): grad_input}
    # count expected contributions: each node sends one grad per input use
    for t in order:
        node = getattr(t, "grad_fn", None)
        if node is not None:
            for inp in node.inputs:
                expected[id(inp)] = expected.get(id(inp), 0) + 1

    ready = [tensor]
    processed = set()
    while ready:
        t = ready.pop()
        if id(t) in processed:
            continue
        node = getattr(t, "grad_fn", None)
        grad = grads.get(id(t))
        if node is None:
            if getattr(t, "requires_grad", False) and grad is not None:
                prev = getattr(t, "grad", None)
                t.grad = grad if prev is None else prev.add(grad)
            processed.add(id(t))
            continue
        processed.add(id(t))
        with no_grad():
            in_grads = node.fn.backward(node.ctx, grad)
        if not isinstance(in_grads, (tuple, list)):
            in_grads = (in_grads,)
        for inp, g in zip(node.inputs, in_grads):
            if g is None:
                continue
            if id(inp) in grads:
                grads[id(inp)] = grads[id(inp)].add(g) if hasattr(grads[id(inp)], "add") else grads[id(inp)] + g
            else:
                grads[id(inp)] = g
            received[id(inp)] = received.get(id(inp), 0) + 1
            if received[id(inp)] >= expected.get(id(inp), 1):
                ready.append(inp)

    # leaves that accumulated grads
    for t in order:
        if (
            getattr(t, "requires_grad", False)
            and getattr(t, "grad_fn", None) is None
            and id(t) in grads
            and getattr(t, "grad", None) is None
        ):
            t.grad = grads[id(t)]


_OPERATOR_ALIASES = {
    "__add__": "add",
    "__radd__": "add",
    "__sub__": "sub",
    "__mul__": "mul",
    "__rmul__": "mul",
    "__matmul__": "matmul",
    "__truediv__": "div",
    "__neg__": "neg",
}


def install_autograd(cls):
    """Wrap registered ops on a tensor class with autograd dispatch, and add
    requires_grad/backward surface."""
    for name in FUNCTION_REGISTRY:
        plain = getattr(cls, name, None)
        if plain is not None and callable(plain):
            _wrap_method(cls, name, plain)

    # re-bind operator dunders: `__add__ = add` aliases captured the plain
    # method at class creation and would silently bypass the tape
    for dunder, target in _OPERATOR_ALIASES.items():
        if hasattr(cls, dunder) and target in FUNCTION_REGISTRY:

            def _op(self, *args, _t=target):
                return getattr(self, _t)(*args)

            _op.__name__ = dunder
            setattr(cls, dunder, _op)

    if getattr(cls, "__slots__", None) is not None and not hasattr(
        cls, "requires_grad"
    ):
        pass  # classes with __slots__ must declare autograd fields themselves

    def backward_method(self, grad_input=None):
        return backward(self, grad_input)

    cls.backward = backward_method

    def detach(self):
        out = self.clone()
        out.requires_grad = False
        return out

    if not hasattr(cls, "detach"):
        cls.detach = detach
