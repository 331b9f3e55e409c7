"""Encrypted nn.Module system (reference: curl/nn/module.py:19-3136).

Modules hold parameters as plaintext jnp arrays until ``encrypt(src)``
converts them to encrypted tensors; ``forward`` is written against the
shared tensor method surface, so the same module runs:

  * eagerly on CrypTensor inputs (stacked simulated parties), and
  * traced on per-party MPCTensor inputs inside compile_parties — the
    parameters pytree (MPCTensor leaves) is vmapped/shard_mapped over the
    party axis by the runtime.

``functional()`` extracts (apply_fn, params) for the compiled path.
"""

from __future__ import annotations

import math
from collections import OrderedDict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import curl_tpu


class Parameter:
    """Marks an array as a trainable parameter at registration time."""

    def __init__(self, value):
        self.value = value


class Module:
    """Base module (reference module.py:19)."""

    def __init__(self):
        self._parameters: "OrderedDict[str, Any]" = OrderedDict()
        self._buffers: "OrderedDict[str, Any]" = OrderedDict()
        self._modules: "OrderedDict[str, Module]" = OrderedDict()
        self.encrypted = False
        self.training = False

    # -- registration --------------------------------------------------
    def register_parameter(self, name, value):
        if isinstance(value, Parameter):
            value = value.value
        if hasattr(value, "detach"):  # torch tensor
            value = jnp.asarray(value.detach().cpu().numpy())
        self._parameters[name] = value

    def register_buffer(self, name, value):
        if hasattr(value, "detach"):
            value = jnp.asarray(value.detach().cpu().numpy())
        self._buffers[name] = value

    def register_module(self, name, module):
        self._modules[name] = module

    def __setattr__(self, name, value):
        if isinstance(value, Parameter):
            self.__dict__.pop(name, None)
            self.register_parameter(name, value)
        elif isinstance(value, Module) and name not in ("_modules",):
            if "_modules" not in self.__dict__:
                object.__setattr__(self, "_modules", OrderedDict())
            # drop a plain attribute of the same name (e.g. a None
            # placeholder) so it cannot shadow the registered module
            self.__dict__.pop(name, None)
            self._modules[name] = value
        else:
            if "_modules" in self.__dict__ and name in self._modules:
                del self._modules[name]
            object.__setattr__(self, name, value)

    def __getattr__(self, name):
        for store in ("_parameters", "_buffers", "_modules"):
            d = self.__dict__.get(store)
            if d is not None and name in d:
                return d[name]
        raise AttributeError(f"{type(self).__name__} has no attribute {name}")

    # -- iteration -------------------------------------------------------
    def named_modules(self, prefix=""):
        yield prefix, self
        for name, m in self._modules.items():
            sub_prefix = f"{prefix}.{name}" if prefix else name
            yield from m.named_modules(sub_prefix)

    def modules(self):
        for _, m in self.named_modules():
            yield m

    def named_parameters(self, prefix=""):
        for name, p in self._parameters.items():
            yield (f"{prefix}.{name}" if prefix else name), p
        for mname, m in self._modules.items():
            sub = f"{prefix}.{mname}" if prefix else mname
            yield from m.named_parameters(sub)

    def parameters(self):
        for _, p in self.named_parameters():
            yield p

    # -- encryption (reference module.py:471-509) -------------------------
    def encrypt(self, mode=True, src=0, seed_compress=False):
        """Encrypt parameters (reference module.py:471-509).

        ``seed_compress=True`` (2PC, compiled/inference path only): store
        parameters as seed-compressed shares — party 1's share is PRG(key)
        regenerated at the point of use inside the compiled program, so
        at-rest share memory halves (mpc/primitives/compressed.py). This is
        what fits GPT-Neo-scale models in one chip's HBM. Compressed
        parameters are not trainable and have no eager-op surface.
        """
        if not mode:
            return self.decrypt()
        if seed_compress:
            return self._encrypt_compressed()
        for m in self.modules():
            for name, p in list(m._parameters.items()):
                if not curl_tpu.is_encrypted_tensor(p):
                    # parameters are trainable by default, exactly like the
                    # reference (module.py:120-127 registers with
                    # requires_grad=True; encrypt() at :478 preserves it), so
                    # SGD(model.parameters()) works without a manual flag
                    m._parameters[name] = curl_tpu.cryptensor(
                        p, src=src, requires_grad=True
                    )
            m.encrypted = True
        return self

    def _encrypt_compressed(self):
        from ..mpc.mpc import MPCTensor
        from ..mpc.primitives.compressed import SeedCompressedArithmetic

        master = jax.random.fold_in(_init_key(), 0x5EEDC0)
        n_drawn = 0
        for m in self.modules():
            for name, p in list(m._parameters.items()):
                # skip already-encrypted leaves and pre-stacked compressed
                # pytrees (PrestackedBlocks / ChunkedLMHead build their own)
                if curl_tpu.is_encrypted_tensor(p) or not hasattr(p, "dtype"):
                    continue
                key = jax.random.fold_in(master, n_drawn)
                n_drawn += 1
                m._parameters[name] = MPCTensor(
                    SeedCompressedArithmetic.encrypt(jnp.asarray(p), key)
                )
            m.encrypted = True
        return self

    def decrypt(self):
        for m in self.modules():
            for name, p in list(m._parameters.items()):
                if curl_tpu.is_encrypted_tensor(p):
                    m._parameters[name] = jnp.asarray(p.get_plain_text())
            m.encrypted = False
        return self

    def train(self, mode=True):
        for m in self.modules():
            m.training = mode
        return self

    def eval(self):
        return self.train(False)

    # -- state dict --------------------------------------------------------
    def state_dict(self, prefix=""):
        out = {}
        for name, p in self._parameters.items():
            out[f"{prefix}{name}"] = p
        for name, b in self._buffers.items():
            out[f"{prefix}{name}"] = b
        for mname, m in self._modules.items():
            out.update(m.state_dict(prefix=f"{prefix}{mname}."))
        return out

    def load_state_dict(self, state, strict=True, prefix=""):
        for name in list(self._parameters):
            key = f"{prefix}{name}"
            if key in state:
                v = state[key]
                if hasattr(v, "detach"):
                    v = jnp.asarray(v.detach().cpu().numpy())
                self._parameters[name] = jnp.asarray(v)
            elif strict:
                raise KeyError(key)
        for name in list(self._buffers):
            key = f"{prefix}{name}"
            if key in state:
                v = state[key]
                if hasattr(v, "detach"):
                    v = jnp.asarray(v.detach().cpu().numpy())
                self._buffers[name] = jnp.asarray(v)
        for mname, m in self._modules.items():
            m.load_state_dict(state, strict=strict, prefix=f"{prefix}{mname}.")
        return self

    # -- functional extraction (compiled path) ------------------------------
    def params_pytree(self):
        """Collect parameters (possibly encrypted) as a nested dict."""
        out = {"__params__": dict(self._parameters)}
        for name, m in self._modules.items():
            out[name] = m.params_pytree()
        return out

    def bind_params(self, tree):
        """Install a params pytree (e.g. per-party MPCTensor leaves)."""
        for name, p in tree.get("__params__", {}).items():
            self._parameters[name] = p
        for name, m in self._modules.items():
            if name in tree:
                m.bind_params(tree[name])
        return self

    def functional(self):
        """(apply_fn, params): apply_fn(params, x) binds + runs forward.

        params leaves may be MPCTensor shares; apply_fn is traceable under
        compile_parties (binding happens at trace time).
        """
        params = self.params_pytree()
        # unwrap eager CrypTensor leaves to their stacked MPCTensor pytrees
        def unwrap(t):
            return jax.tree_util.tree_map(
                lambda x: x.mpc if isinstance(x, curl_tpu.CrypTensor) else x,
                t,
                is_leaf=lambda x: isinstance(x, curl_tpu.CrypTensor),
            )

        params = unwrap(params)

        def apply_fn(p, *inputs):
            self.bind_params(p)
            return self.forward(*inputs)

        return apply_fn, params

    # -- call ----------------------------------------------------------------
    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    # -- training-side helpers (reference module.py:321-347) -----------------
    def zero_grad(self):
        """Clear accumulated gradients on every parameter (reference
        module.py:313-316) — backward ACCUMULATES into .grad, so training
        loops must reset between steps."""
        for p in self.parameters():
            if hasattr(p, "grad"):
                p.grad = None
        return self

    def update_parameters(self, learning_rate, grad_threshold=100):
        """SGD step over encrypted parameters with the reference's
        grad-explosion guard (module.py:321-347): gradients whose square
        exceeds grad_threshold^2 are zeroed before the update."""
        from ..autograd import no_grad

        with no_grad():
            for m in self.modules():
                for name, p in list(m._parameters.items()):
                    g = getattr(p, "grad", None)
                    if g is None:
                        continue
                    if grad_threshold is not None:
                        mask = g.square().lt(grad_threshold * grad_threshold)
                        g = g.mul(mask)
                    new_p = p.sub(g.mul(learning_rate))
                    new_p.requires_grad = True
                    m._parameters[name] = new_p
        return self


def scan_identical_blocks(blocks, x):
    """Run a Sequential of structurally-identical blocks as one lax.scan.

    TPU-first compile-time optimization: a 12-block GPT-2 traces ONE block
    body instead of twelve copies. Per-block parameters are stacked along a
    leading axis (MPCTensor leaves stack transparently as pytrees) and each
    iteration forks the PRNG context by block index so protocol randomness
    (Beaver masks, one-hot tuples) is never reused across blocks.

    Only valid under a single trace (compiled path) with MPCTensor inputs.
    """
    import jax as _jax
    from jax import lax as _lax

    from .. import random as _rng
    from ..mpc.mpc import MPCTensor

    if isinstance(blocks, PrestackedBlocks):
        # params were stacked at BUILD time (streaming construction for
        # models whose per-block stack cannot afford a second in-graph
        # copy — see models/gpt.py build_compressed); scan them directly
        template = blocks.template
        stacked = blocks._parameters["stacked"]
        n = blocks.n

        def body(carry, inp):
            params_i, idx = inp
            with _rng.fork(idx):
                template.bind_params(params_i)
                out = template.forward(carry)
            return out, None

        out, _ = _lax.scan(body, x, (stacked, jnp.arange(n)))
        return out

    block_list = list(blocks)
    n = len(block_list)
    if n == 1 or not isinstance(x, MPCTensor):
        for b in block_list:
            x = b(x)
        return x

    template = block_list[0]
    trees = [b.params_pytree() for b in block_list]
    stacked = _jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    def body(carry, inp):
        params_i, idx = inp
        with _rng.fork(idx):
            template.bind_params(params_i)
            out = template.forward(carry)
        return out, None

    out, _ = _lax.scan(body, x, (stacked, jnp.arange(n)))
    # restore template's own parameters
    template.bind_params(trees[0])
    return out


def stack_compressed_chunks(weight, n_chunks, axis, write_fn, master_key):
    """Slice ``weight`` into n equal chunks along ``axis`` (zero-padded),
    seed-compress each with its own key, and stack into ONE pre-allocated
    buffer via donated writes. Returns (stacked_tree, chunk_len, padded_len).
    The shared storage pattern of ChunkedLinear / ChunkedLMHead /
    ChunkedEmbedding — peak memory stays one chunk above the final stack."""
    import jax

    from ..mpc.mpc import MPCTensor
    from ..mpc.primitives.compressed import SeedCompressedArithmetic

    L = weight.shape[axis]
    cl = -(-L // n_chunks)
    stacked = None
    treedef = None
    for i in range(n_chunks):
        lo = i * cl
        n_real = max(0, min(cl, L - lo))
        sl = [slice(None)] * weight.ndim
        sl[axis] = slice(lo, lo + n_real)
        rows = weight[tuple(sl)]
        if n_real < cl:
            pad = [(0, 0)] * weight.ndim
            pad[axis] = (0, cl - n_real)
            rows = jnp.pad(rows, pad)
        t = SeedCompressedArithmetic.encrypt(
            rows, jax.random.fold_in(master_key, i)
        )
        leaves, treedef = jax.tree_util.tree_flatten(MPCTensor(t))
        if stacked is None:
            stacked = [
                jnp.zeros((n_chunks,) + l.shape, l.dtype) for l in leaves
            ]
        stacked = [write_fn(s, l, i) for s, l in zip(stacked, leaves)]
        del rows, t, leaves
    return jax.tree_util.tree_unflatten(treedef, stacked), cl, cl * n_chunks


class ChunkedLinear(Module):
    """Linear over a chunked seed-compressed weight.

    ``axis=0`` chunks the OUTPUT features (results concatenate); ``axis=1``
    chunks the INPUT features (partial products accumulate). Either way the
    per-iteration live set — expanded weight chunk, its Beaver-triple
    masks, reveal buffers — is 1/n of a full Linear's, which is what keeps
    GPT-Neo's (2048, 8192) FFN weights inside HBM next to the resident
    share0 stacks. Built from a PLAIN weight at streaming-construction
    time (models/gpt.py build_compressed)."""

    def __init__(self, weight, bias, n_chunks, axis, write_fn,
                 salt=13 << 20):
        super().__init__()
        import jax

        out_f, in_f = weight.shape
        self.out_features = out_f
        self.in_features = in_f
        self.n_chunks = n_chunks
        self.axis = axis
        self.salt = salt
        master = jax.random.fold_in(_init_key(), 0xC4C4 + axis)
        tree, cl, _pad = stack_compressed_chunks(
            weight, n_chunks, axis, write_fn, master
        )
        self.chunk_len = cl
        self._parameters["wchunks"] = tree
        if bias is not None:
            self.register_parameter("bias", bias)

    def forward(self, x):
        from jax import lax

        from .. import random as _rng
        from ..mpc.mpc import MPCTensor

        w = self._parameters["wchunks"]
        lead = x.shape[:-1]

        if self.axis == 0:
            def body(carry, inp):
                w_i, i = inp
                with _rng.fork(i + self.salt):
                    y_i = x.matmul(w_i.t())
                return carry, y_i

            _, pieces = lax.scan(body, 0, (w, jnp.arange(self.n_chunks)))
            # (n, ..., cl) -> (..., n * cl), chunk-major along features
            share = jnp.moveaxis(pieces._tensor.share, 0, -2)
            share = share.reshape(lead + (self.n_chunks * self.chunk_len,))
            if self.n_chunks * self.chunk_len != self.out_features:
                share = share[..., : self.out_features]
            out = MPCTensor(
                pieces._tensor.with_share(share), pieces.ptype
            )
        else:
            cl = self.chunk_len
            x_sh = x._tensor.share
            pad = self.n_chunks * cl - self.in_features
            if pad:
                x_sh = jnp.pad(
                    x_sh, [(0, 0)] * (x_sh.ndim - 1) + [(0, pad)]
                )

            def body(carry, inp):
                w_i, i = inp
                with _rng.fork(i + self.salt):
                    sl = lax.dynamic_slice_in_dim(
                        x_sh, i * cl, cl, x_sh.ndim - 1
                    )
                    x_i = MPCTensor(x._tensor.with_share(sl), x.ptype)
                    y_i = x_i.matmul(w_i.t())
                return carry + y_i._tensor.share, None

            init = jnp.zeros(lead + (self.out_features,), jnp.uint64)
            acc, _ = lax.scan(body, init, (w, jnp.arange(self.n_chunks)))
            from ..mpc.primitives.arithmetic import ArithmeticSharedTensor

            out = MPCTensor(
                ArithmeticSharedTensor(acc, x._tensor.encoder)
            )
        if "bias" in self._parameters:
            out = out + self._parameters["bias"]
        return out


class PrestackedBlocks(Module):
    """N structurally-identical blocks whose per-block parameters were
    stacked along a leading axis at BUILD time.

    scan_identical_blocks normally stacks block params in-graph
    (jnp.stack at trace time) — fine at GPT-2 scale, but at GPT-Neo scale
    the stack is a ~10 GB concatenate whose inputs are live program
    parameters, doubling HBM right when it cannot be afforded. Streaming
    construction (models/gpt.py build_compressed) writes each block's
    (seed-compressed) params into ONE pre-allocated stacked buffer with a
    donated update, so peak memory stays one-block-sized above the final
    footprint, and the scan consumes the stack directly.

    ``template`` is intentionally NOT a registered submodule: its
    parameters are rebound every scan iteration and must not appear in
    params_pytree() as a second (stale) copy.
    """

    def __init__(self, template, stacked_tree, n):
        super().__init__()
        object.__setattr__(self, "template", template)
        self._parameters["stacked"] = stacked_tree
        self.n = n

    def forward(self, x):
        return scan_identical_blocks(self, x)

    def __iter__(self):
        raise TypeError(
            "PrestackedBlocks holds fused per-block parameters; iterate "
            "is only meaningful on materialized Sequential blocks"
        )


def scan_chunked(fn, x, chunk, salt=9 << 20):
    """Apply ``fn`` independently to chunks of ``x``'s leading axis under
    ONE lax.scan body.

    TPU-first compile/memory optimization for position-independent stages
    (embedding lookup, LM head + vocab softmax): the traced body and its
    live intermediates (one-hot tuples, limb-matmul products, comparison
    circuits) are sized for ``chunk`` rows regardless of the real row
    count, so batch-8 costs the same compiler memory as batch-1. Each
    iteration forks the PRNG context by chunk index (offset by ``salt`` so
    streams never collide with block-scan or fold-scan forks) — protocol
    randomness is never reused across chunks.

    Falls back to a direct call when ``x`` is not an MPCTensor, ``chunk``
    is non-positive, or the leading axis is not a positive multiple of
    ``chunk``. Only valid under a single trace (compiled path).
    """
    from jax import lax as _lax

    from .. import random as _rng
    from ..mpc.mpc import MPCTensor

    n = x.shape[0] if x.shape else 0
    if (
        not isinstance(x, MPCTensor)
        or chunk <= 0
        or n <= chunk
        or n % chunk != 0
    ):
        return fn(x)
    g = n // chunk
    xc = x.reshape(g, chunk, *x.shape[1:])

    def body(carry, inp):
        xi, idx = inp
        with _rng.fork(idx + salt):
            yi = fn(xi)
        return carry, yi

    _, ys = _lax.scan(body, 0, (xc, jnp.arange(g)))
    return ys.reshape(n, *ys.shape[2:])


class Sequential(Module):
    """(reference module.py:764)"""

    def __init__(self, *modules):
        super().__init__()
        if len(modules) == 1 and isinstance(modules[0], (list, tuple)):
            modules = tuple(modules[0])
        for i, m in enumerate(modules):
            self.register_module(str(i), m)

    def forward(self, x):
        for m in self._modules.values():
            x = m(x)
        return x

    def append(self, module):
        self.register_module(str(len(self._modules)), module)
        return self

    def __len__(self):
        return len(self._modules)

    def __getitem__(self, idx):
        return list(self._modules.values())[idx]


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in):
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float64)


_init_counter = [0]


def _init_key():
    _init_counter[0] += 1
    return jax.random.PRNGKey(_init_counter[0] * 7919 + 13)


class Linear(Module):
    """y = x W^T + b (reference module.py:1883)."""

    def __init__(self, in_features, out_features, bias=True):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.register_parameter(
            "weight", _kaiming_uniform(_init_key(), (out_features, in_features), in_features)
        )
        if bias:
            self.register_parameter(
                "bias", _kaiming_uniform(_init_key(), (out_features,), in_features)
            )
        else:
            self._has_bias = False

    def forward(self, x):
        w = self._parameters["weight"]
        wt = w.t() if hasattr(w, "t") else w.T
        out = x.matmul(wt)
        if "bias" in self._parameters:
            out = out + self._parameters["bias"]
        return out


class Conv2d(Module):
    """(reference module.py:2225)"""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        fan_in = in_channels // groups * kernel_size[0] * kernel_size[1]
        self.register_parameter(
            "weight",
            _kaiming_uniform(
                _init_key(),
                (out_channels, in_channels // groups) + kernel_size,
                fan_in,
            ),
        )
        if bias:
            self.register_parameter(
                "bias", _kaiming_uniform(_init_key(), (out_channels,), fan_in)
            )

    def forward(self, x):
        out = x.conv2d(
            self._parameters["weight"],
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )
        if "bias" in self._parameters:
            b = self._parameters["bias"]
            b = b.reshape(1, -1, 1, 1) if not curl_tpu.is_encrypted_tensor(b) else b.view(1, -1, 1, 1)
            out = out + b
        return out


class Conv1d(Module):
    """(reference module.py:2092)"""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        fan_in = in_channels // groups * kernel_size[0]
        self.register_parameter(
            "weight",
            _kaiming_uniform(
                _init_key(), (out_channels, in_channels // groups) + kernel_size, fan_in
            ),
        )
        if bias:
            self.register_parameter(
                "bias", _kaiming_uniform(_init_key(), (out_channels,), fan_in)
            )

    def forward(self, x):
        out = x.conv1d(
            self._parameters["weight"],
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )
        if "bias" in self._parameters:
            b = self._parameters["bias"]
            b = b.reshape(1, -1, 1) if not curl_tpu.is_encrypted_tensor(b) else b.view(1, -1, 1)
            out = out + b
        return out


class _ConvTransposeNd(Module):
    """Transposed convolution (reference module.py's ConvTranspose shims;
    compute via MPCTensor.conv_transpose{1,2}d → ring.conv_transpose*,
    torch IOHW weight layout)."""

    _ndim = 2

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, output_padding=0, groups=1, bias=True, dilation=1):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * self._ndim
        if groups != 1:
            raise NotImplementedError("grouped conv_transpose not implemented")
        self.stride = stride
        self.padding = padding
        self.output_padding = output_padding
        self.dilation = dilation
        self.groups = groups
        fan_in = out_channels * int(np.prod(kernel_size))
        # torch layout: (in_channels, out_channels/groups, *kernel)
        self.register_parameter(
            "weight",
            _kaiming_uniform(
                _init_key(), (in_channels, out_channels // groups) + tuple(kernel_size), fan_in
            ),
        )
        if bias:
            self.register_parameter(
                "bias", _kaiming_uniform(_init_key(), (out_channels,), fan_in)
            )

    def forward(self, x):
        op = "conv_transpose%dd" % self._ndim
        out = getattr(x, op)(
            self._parameters["weight"],
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
            dilation=self.dilation,
            groups=self.groups,
        )
        if "bias" in self._parameters:
            b = self._parameters["bias"]
            bshape = (1, -1) + (1,) * self._ndim
            b = b.reshape(*bshape) if not curl_tpu.is_encrypted_tensor(b) else b.view(*bshape)
            out = out + b
        return out


class ConvTranspose1d(_ConvTransposeNd):
    _ndim = 1


class ConvTranspose2d(_ConvTransposeNd):
    _ndim = 2


class ReLU(Module):
    def forward(self, x):
        return x.relu()


class ReLU6(Module):
    def forward(self, x):
        return x.hardtanh(0, 6)


class GELU(Module):
    def forward(self, x):
        return x.gelu()


class SiLU(Module):
    def forward(self, x):
        return x.silu()


class Sigmoid(Module):
    def forward(self, x):
        return x.sigmoid()


class Tanh(Module):
    def forward(self, x):
        return x.tanh()


class Hardtanh(Module):
    def __init__(self, min_val=-1.0, max_val=1.0):
        super().__init__()
        self.min_val = min_val
        self.max_val = max_val

    def forward(self, x):
        return x.hardtanh(self.min_val, self.max_val)


class Softmax(Module):
    def __init__(self, dim=-1):
        super().__init__()
        self.dim = dim

    def forward(self, x):
        return x.softmax(self.dim)


class LogSoftmax(Module):
    def __init__(self, dim=-1):
        super().__init__()
        self.dim = dim

    def forward(self, x):
        return x.log_softmax(self.dim)


class Dropout(Module):
    def __init__(self, p=0.5):
        super().__init__()
        self.p = p

    def forward(self, x):
        return x.dropout(p=self.p, training=self.training)


class Flatten(Module):
    def __init__(self, start_dim=1, end_dim=-1):
        super().__init__()
        self.start_dim = start_dim
        self.end_dim = end_dim

    def forward(self, x):
        return x.flatten(self.start_dim, self.end_dim)


class AvgPool2d(Module):
    def __init__(self, kernel_size, stride=None, padding=0, ceil_mode=False):
        super().__init__()
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.ceil_mode = ceil_mode

    def forward(self, x):
        return x.avg_pool2d(
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            ceil_mode=self.ceil_mode,
        )


class MaxPool2d(Module):
    def __init__(self, kernel_size, stride=None, padding=0, ceil_mode=False):
        super().__init__()
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.ceil_mode = ceil_mode

    def forward(self, x):
        return x.max_pool2d(
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            ceil_mode=self.ceil_mode,
        )


def layernorm(x, weight, bias, eps=1e-5, dims=1):
    """(x - mean) * inv_sqrt(var + eps) * weight + bias over trailing dims
    (reference gradients.py:1956-2031)."""
    axes = tuple(range(x.dim() - dims, x.dim()))
    mean = x.mean(axis=axes, keepdim=True)
    variance = x.var(axis=axes, keepdim=True)
    inv_var = (variance + eps).inv_sqrt()
    out = (x - mean) * inv_var
    return out * weight + bias


class LayerNorm(Module):
    """(reference module.py:2941)"""

    def __init__(self, normalized_shape, eps=1e-5):
        super().__init__()
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = eps
        self.register_parameter("weight", jnp.ones(self.normalized_shape, jnp.float64))
        self.register_parameter("bias", jnp.zeros(self.normalized_shape, jnp.float64))

    def forward(self, x):
        return layernorm(
            x,
            self._parameters["weight"],
            self._parameters["bias"],
            eps=self.eps,
            dims=len(self.normalized_shape),
        )


class _BatchNorm(Module):
    """(reference module.py:2966-3126)"""

    def __init__(self, num_features, eps=1e-5, momentum=0.1):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.register_parameter("weight", jnp.ones((num_features,), jnp.float64))
        self.register_parameter("bias", jnp.zeros((num_features,), jnp.float64))
        self.register_buffer("running_mean", jnp.zeros((num_features,), jnp.float64))
        self.register_buffer("running_var", jnp.ones((num_features,), jnp.float64))

    def forward(self, x):
        # channel axis = 1; broadcast stats over other axes
        shape = [1] * x.dim()
        shape[1] = self.num_features
        w = self._parameters["weight"]
        b = self._parameters["bias"]
        w = w.view(shape) if curl_tpu.is_encrypted_tensor(w) else w.reshape(shape)
        b = b.view(shape) if curl_tpu.is_encrypted_tensor(b) else b.reshape(shape)
        if self.training:
            axes = tuple(i for i in range(x.dim()) if i != 1)
            mean = x.mean(axis=axes, keepdim=True)
            variance = x.var(axis=axes, keepdim=True)
            inv = (variance + self.eps).inv_sqrt()
            return (x - mean) * inv * w + b
        rm = self._buffers["running_mean"].reshape(shape)
        rv = self._buffers["running_var"].reshape(shape)
        inv = 1.0 / np.sqrt(np.asarray(rv) + self.eps)
        return (x - rm) * (np.asarray(inv)) * w + b


class BatchNorm1d(_BatchNorm):
    pass


class BatchNorm2d(_BatchNorm):
    pass


class BatchNorm3d(_BatchNorm):
    pass


class GroupNorm(Module):
    """Group normalization over (C/G, spatial) slices.

    The reference stubs this out (reference module.py:3128
    raises NotImplementedError); implemented here: reshape channels into
    `num_groups` groups, normalize each group with the inv_sqrt LUT, then
    apply the per-channel affine transform.
    """

    def __init__(self, num_groups, num_channels, eps=1e-5, affine=True):
        super().__init__()
        assert num_channels % num_groups == 0, (
            "num_channels must be divisible by num_groups"
        )
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = eps
        self.affine = affine
        if affine:
            self.register_parameter(
                "weight", jnp.ones((num_channels,), jnp.float64)
            )
            self.register_parameter(
                "bias", jnp.zeros((num_channels,), jnp.float64)
            )

    def forward(self, x):
        shape = tuple(x.shape)
        n, c = shape[0], shape[1]
        spatial = shape[2:]
        g = self.num_groups
        grouped = x.reshape(n, g, (c // g) * int(np.prod(spatial)) or c // g)
        mean = grouped.mean(axis=-1, keepdim=True)
        variance = grouped.var(axis=-1, keepdim=True)
        inv = (variance + self.eps).inv_sqrt()
        normed = (grouped - mean) * inv
        out = normed.reshape(*shape)
        if self.affine:
            w = self._parameters["weight"]
            b = self._parameters["bias"]
            bshape = (1, c) + (1,) * len(spatial)
            w = w.view(*bshape) if curl_tpu.is_encrypted_tensor(w) else np.asarray(w).reshape(bshape)
            b = b.view(*bshape) if curl_tpu.is_encrypted_tensor(b) else np.asarray(b).reshape(bshape)
            out = out * w + b
        return out


class Embedding(Module):
    """Private embedding via the one-hot LUT protocol
    (reference module.py:1998, beaver.evaluate_embed)."""

    def __init__(self, vocab_size, embed_dim):
        super().__init__()
        self.vocab_size = vocab_size
        self.embed_dim = embed_dim
        self.register_parameter(
            "weight",
            jax.random.normal(_init_key(), (vocab_size, embed_dim), jnp.float64),
        )

    def forward(self, x):
        return x.evaluate_embed(self._parameters["weight"])


class Attention(Module):
    """Fused multi-head attention block (reference module.py:1968-1996).

    ``causal=True`` applies a public lower-triangular mask inside the
    softmax (masked lanes get probability exactly 0; zero protocol cost —
    see functions/approximations.py softmax). The reference module is
    non-causal; the flag is the additive piece that makes autoregressive
    generation (examples/generate.py) correct."""

    def __init__(self, embed_dim, num_heads, causal=False):
        super().__init__()
        assert embed_dim % num_heads == 0, "invalid heads and embedding dimension"
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.search_dim = embed_dim // num_heads
        self.causal = causal
        self.search = Linear(embed_dim, 3 * embed_dim)
        self.proj = Linear(embed_dim, embed_dim)

    def forward(self, x):
        import jax.numpy as jnp

        batch_size, seq_len = x.shape[0], x.shape[1]
        qkv = self.search(x)
        query, key, value = qkv.split(self.embed_dim, dim=2)
        query = query.reshape(batch_size, seq_len, self.num_heads, self.search_dim).transpose(1, 2)
        key = key.reshape(batch_size, seq_len, self.num_heads, self.search_dim).permute(0, 2, 3, 1)
        value = value.reshape(batch_size, seq_len, self.num_heads, self.search_dim).transpose(1, 2)

        attn = query.matmul(key) / math.sqrt(self.search_dim)
        if self.causal:
            mask = jnp.tril(jnp.ones((seq_len, seq_len), jnp.float64))
            attn = attn.softmax(-1, mask=mask)
        else:
            attn = attn.softmax(-1)
        y = attn.matmul(value).transpose(1, 2).reshape(batch_size, seq_len, self.embed_dim)
        return self.proj(y)
