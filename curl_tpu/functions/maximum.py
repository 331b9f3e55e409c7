"""max / min / argmax / argmin reductions (reference:
curl/common/functions/maximum.py). Five methods selected by
cfg.functions.max_method: pairwise (O(n^2) comparisons, constant rounds),
log_reduction (O(n), O(log n) rounds), double_log_reduction,
accelerated_cascade, and the TPU-first scan_reduction (fixed-shape
butterfly under lax.scan — O(log n) rounds, graph traced once). Ties are
broken with a weighted random one-hot.
"""

from __future__ import annotations

import math
from builtins import max as builtins_max

import jax.numpy as jnp
import numpy as np

from ..config import cfg
from ..mpc.mpc import MPCTensor

__all__ = ["argmax", "argmin", "max", "min", "max_value"]


def argmax(self, dim=None, keepdim=False, one_hot=True):
    method = cfg.functions.max_method
    if self.dim() == 0:
        val = jnp.ones(()) if one_hot else jnp.zeros(())
        return MPCTensor.encrypt(val, src=0)
    result = _argmax_helper(self, dim, one_hot, method, _return_max=False)
    if not one_hot:
        result = _one_hot_to_index(result, dim, keepdim)
    return result


def argmin(self, dim=None, keepdim=False, one_hot=True):
    return (-self).argmax(dim=dim, keepdim=keepdim, one_hot=one_hot)


def max(self, dim=None, keepdim=False, one_hot=True):
    method = cfg.functions.max_method
    if dim is None:
        if method in ["log_reduction", "double_log_reduction", "scan_reduction"]:
            return _max_helper_all_tree_reductions(self, method=method)
        argmax_result = self.argmax(one_hot=True)
        return self.mul(argmax_result).sum()
    argmax_result, max_result = _argmax_helper(
        self, dim=dim, one_hot=True, method=method, _return_max=True
    )
    if max_result is None:
        max_result = (self * argmax_result).sum(axis=dim, keepdim=keepdim)
    if keepdim and max_result.dim() < self.dim():
        max_result = max_result.unsqueeze(dim)
    if one_hot:
        return max_result, argmax_result
    return max_result, _one_hot_to_index(argmax_result, dim, keepdim)


def min(self, dim=None, keepdim=False, one_hot=True):
    result = (-self).max(dim=dim, keepdim=keepdim, one_hot=one_hot)
    if dim is None:
        return -result
    return -result[0], result[1]


def max_value(self, dim=None, keepdim=False):
    """Max VALUES only — skips the argmax one-hot entirely.

    The reference's ``max(dim)`` (maximum.py:39-54) always derives the
    argmax one-hot (a full-width eq circuit + weighted tie-break) even
    when the caller discards it; softmax's max-shift (approximations.py:
    1150) is exactly that case, and over an LLM vocab the discarded
    argmax costs as much as the max tree itself. For the tree-reduction
    methods the value is available directly; pairwise falls back to the
    full (value, argmax) computation since it derives the value FROM the
    one-hot.
    """
    method = cfg.functions.max_method
    if self.dim() == 0:
        return self
    if method in ("log_reduction", "double_log_reduction",
                  "accelerated_cascade", "scan_reduction"):
        inp = self.flatten() if dim is None else self
        d = 0 if dim is None else dim
        out = _max_helper_all_tree_reductions(inp, dim=d, method=method)
        if dim is None:
            return out
        if keepdim and out.dim() < self.dim():
            out = out.unsqueeze(dim)
        return out
    if dim is None:
        return self.max()
    return self.max(dim, keepdim=keepdim)[0]


def _argmax_helper_pairwise(enc_tensor, dim=None):
    """All-pairs comparisons, one round (maximum.py:95)."""
    dim = -1 if dim is None else dim
    row_length = enc_tensor.size(dim) if enc_tensor.size(dim) > 1 else 2

    a = enc_tensor.expand(row_length - 1, *enc_tensor.size())
    b = MPCTensor.stack(
        [enc_tensor.roll(i + 1, dims=dim) for i in range(row_length - 1)]
    )
    pairwise = a.ge(b)
    if row_length - 1 < 128:
        result = pairwise.prod(0)
    else:
        result = pairwise.sum(axis=0).ge(row_length - 1)
    return result, None


def _compute_pairwise_comparisons_for_steps(input_tensor, dim, steps):
    x = input_tensor
    for _ in range(steps):
        m = x.size(dim)
        a, b, remainder = x.split([m // 2, m // 2, m % 2], dim=dim)
        pairwise_max = a.where(a.ge(b), b)
        parts = [pairwise_max] + ([remainder] if m % 2 else [])
        x = MPCTensor.cat(parts, axis=dim) if len(parts) > 1 else pairwise_max
    return x


def _max_helper_log_reduction(enc_tensor, dim=None):
    if enc_tensor.dim() == 0:
        return enc_tensor
    inp, dim_used = enc_tensor, dim
    if dim is None:
        dim_used = 0
        inp = enc_tensor.flatten()
    n = inp.size(dim_used)
    steps = int(math.log(n)) if n > 1 else 0
    reduced = _compute_pairwise_comparisons_for_steps(inp, dim_used, steps)
    with cfg.temp_override({"functions.max_method": "pairwise"}):
        enc_max_vec, _ = reduced.max(dim=dim_used)
    return enc_max_vec


def _max_helper_double_log_recursive(enc_tensor, dim):
    n = enc_tensor.size(dim)
    sqrt_n = int(math.sqrt(n))
    if n == 1 or sqrt_n <= 1:
        if n == 1:
            return enc_tensor
        with cfg.temp_override({"functions.max_method": "pairwise"}):
            m, _ = enc_tensor.max(dim=dim, keepdim=True)
        return m
    count_sqrt_n = n // sqrt_n
    split_t, remainder = enc_tensor.split([sqrt_n * count_sqrt_n, n % sqrt_n], dim=dim)
    size_arr = [enc_tensor.size(i) for i in range(enc_tensor.dim())]
    size_arr[dim], size_arr[dim + 1] = sqrt_n, enc_tensor.size(dim + 1) * count_sqrt_n
    split_t = split_t.reshape(size_arr)
    split_max = _max_helper_double_log_recursive(split_t, dim)
    size_arr[dim], size_arr[dim + 1] = count_sqrt_n, enc_tensor.size(dim + 1)
    enc_max_tensor = split_max.reshape(size_arr)
    full = (
        MPCTensor.cat([enc_max_tensor, remainder], axis=dim)
        if n % sqrt_n
        else enc_max_tensor
    )
    with cfg.temp_override({"functions.max_method": "pairwise"}):
        enc_max, _ = full.max(dim=dim, keepdim=True)
    return enc_max


def _max_helper_double_log_reduction(enc_tensor, dim=None):
    if enc_tensor.dim() == 0:
        return enc_tensor
    inp, dim_used = enc_tensor, dim
    size_arr = ()
    if dim is None:
        dim_used = 0
        inp = enc_tensor.flatten()
    dim_used = dim_used + inp.dim() if dim_used < 0 else dim_used
    if inp.dim() > 1:
        size_arr = [inp.size(i) for i in range(inp.dim()) if i != dim_used]
    inp = inp.unsqueeze(dim_used + 1)
    out = _max_helper_double_log_recursive(inp, dim_used)
    out = out.squeeze(dim_used + 1)
    return out.reshape(size_arr)


def _max_helper_accelerated_cascade(enc_tensor, dim=None):
    if enc_tensor.dim() == 0:
        return enc_tensor
    inp, dim_used = enc_tensor, dim
    if dim is None:
        dim_used = 0
        inp = enc_tensor.flatten()
    n = inp.size(dim_used)
    if n < 3:
        with cfg.temp_override({"functions.max_method": "pairwise"}):
            enc_max, _ = enc_tensor.max(dim=dim_used)
        return enc_max
    # builtins.max explicitly: this module's `max` is the MPC reduction
    import builtins

    steps = int(math.log(builtins.max(math.log(builtins.max(math.log(n), 1)), 1))) + 1
    reduced = _compute_pairwise_comparisons_for_steps(enc_tensor, dim_used, steps)
    return _max_helper_double_log_reduction(reduced, dim=dim_used)


def _use_fused_max_step():
    """cfg.mpc.fused_max_step = "pallas_tpu": run each tournament step
    (compare + select) as one fused TPU kernel (ops/pallas_max_step.py).
    2PC simulated-party runtime only; requires a TPU backend."""
    import jax

    from .. import comm

    try:
        enabled = cfg.mpc.fused_max_step == "pallas_tpu"
    except AttributeError:
        return False
    return (
        enabled
        and comm.get_world_size() == 2
        and comm.get_runtime() == "vmap"  # kernel math lives in a
        # custom_vmap batching rule over the party axis; under shard_map
        # there is no vmap axis and the unbatched primal would run
        and jax.default_backend() == "tpu"
    )


def _tournament_select(carry, rolled, fused):
    """new = rolled + (carry >= rolled) * (carry - rolled) — one compare +
    one single-mul select, optionally fused into one TPU kernel."""
    if fused:
        from ..ops.pallas_max_step import fused_max_step_mpc

        return fused_max_step_mpc(carry, rolled)
    keep = carry.ge(rolled)
    return carry.sub(rolled).mul(keep).add(rolled)


def _max_helper_scan_reduction(enc_tensor, dim=None):
    """TPU-first max: chunk-fold scan head + fixed-shape butterfly tail.

    Same comparison primitive as log_reduction, restructured for the XLA
    compilation model. The pure butterfly-scan compared the FULL padded
    width on every level — padded*log2(padded) comparisons, 21x the optimal
    count at vocab 50257. Unrolling a true-halving head fixes the work but
    instantiates one comparison-circuit subgraph per level, and circuit HLO
    size is shape-independent — the remote compiler OOMs. This form keeps
    O(log_f(W)) circuit instances (~4 at vocab scale):

      1. a CASCADE of fold scans: reshape the padded axis to (G, W) chunks
         (W = cfg.functions.scan_fixed_width) and lax.scan an elementwise
         running max over the G chunks — ONE traced body per stage — then
         repeat with W shrinking by cfg.functions.scan_cascade_factor per
         stage down to cfg.functions.scan_cascade_min. Total comparisons
         stay O(n);
      2. butterfly tail over the final cascade_min lanes — ONE traced
         body, min*log2(min) comparisons.

    Every select costs ONE Beaver mul (b + (a-b)*(a>=b)) instead of the
    two-mul `where` form. Round complexity is G + log2(W) sequential
    levels vs the reference's log2(n) — the right trade on a fused
    single-program TPU runtime where per-level cost is work-bound, not
    latency-bound (tune W upward for multi-host WAN deployments where
    rounds dominate). Fresh protocol randomness per level via rng.fork
    (fold uses indices >= 2**20 so head/tail streams never collide).
    """
    from jax import lax

    from .. import random as _rng

    if enc_tensor.dim() == 0:
        return enc_tensor
    inp, dim_used = enc_tensor, dim
    if dim is None:
        dim_used = 0
        inp = enc_tensor.flatten()
    dim_used = dim_used + inp.dim() if dim_used < 0 else dim_used

    # move reduce axis last (preserving the order of the remaining axes)
    # and pad to a power of two with a very negative public constant
    if dim_used != inp.dim() - 1:
        perm = [i for i in range(inp.dim()) if i != dim_used] + [dim_used]
        x = inp.permute(*perm)
    else:
        x = inp
    n = x.size(x.dim() - 1)
    # NB: this module's `max` is the MPC reduction — use math for the scalar
    k = int(math.ceil(math.log2(n))) if n > 1 else 1
    padded = 1 << k
    if padded != n:
        # Pad with the most-negative decoded value whose pairwise differences
        # stay within the active comparison ring's sign envelope (|a-b| <
        # 2^(w-1) ring units for cfg.mpc.compare_bits = w): encoded -2^(w-3).
        # A fixed -(2^24) sentinel would silently lose to representable
        # inputs at or below it; conversely inputs below -2^(w-3) are already
        # outside the exact-comparison envelope, so the sentinel is as
        # negative as any comparable input can be.
        from ..mpc.mpc import _compare_bits

        prec = inp.encoder.precision_bits
        x = x.pad((0, padded - n), value=-float(2 ** (_compare_bits() - 3 - prec)))

    try:
        fixed_width = int(cfg.functions.scan_fixed_width)
    except (AttributeError, TypeError):
        fixed_width = 2048
    # NB: this module's `max` is the MPC reduction — clamp with builtins-free
    # arithmetic; round down to a power of two so (G, W) tiles exactly
    if fixed_width < 1:
        fixed_width = 1
    fixed_width = 1 << int(math.floor(math.log2(fixed_width)))

    try:
        cascade_min = int(cfg.functions.scan_cascade_min)
    except (AttributeError, TypeError):
        cascade_min = 128
    try:
        cascade_factor = int(cfg.functions.scan_cascade_factor)
    except (AttributeError, TypeError):
        cascade_factor = 8
    if cascade_factor < 2:
        cascade_factor = 2
    cascade_min = builtins_max(1, 1 << int(math.floor(math.log2(
        builtins_max(cascade_min, 1)))))

    fused = _use_fused_max_step()

    def fold_to(x, width_out, salt):
        """(..., W_in) -> (..., width_out): ONE traced scan body folds the
        W_in / width_out chunks into a running elementwise max."""
        d = x.dim()
        width_in = x.size(d - 1)
        groups = width_in // width_out
        chunked = x.reshape(*(x.size()[:-1] + (groups, width_out)))
        # move the group axis to the front for lax.scan
        chunked = chunked.permute(d - 1, *range(d - 1), d)
        carry0 = chunked[0]

        def fold(carry, inputs):
            chunk, idx = inputs
            with _rng.fork(idx):
                new = _tournament_select(carry, chunk, fused)
            return new, None

        out, _ = lax.scan(
            fold, carry0, (chunked[1:], jnp.arange(groups - 1) + salt)
        )
        return out

    # -- cascade of fold scans: padded -> W -> W/f -> ... -> cascade_min.
    # Each stage is ONE traced circuit body (compile size stays O(#stages)),
    # and each stage's work is ~its input width — total comparisons stay
    # O(n), unlike a full-width butterfly tail whose masked lanes burn
    # W*log2(W) comparisons. Rounds grow by ~(f-1)*log_f(W/min) sequential
    # levels — the right trade on a fused single-program TPU runtime where
    # per-level cost is work-bound, not latency-bound (raise
    # cfg.functions.scan_cascade_min toward W for round-bound multi-host
    # WAN deployments).
    width = padded if padded < fixed_width else fixed_width
    if padded > width:
        x = fold_to(x, width, 1 << 20)
    stage = 2
    while width > cascade_min:
        next_w = builtins_max(width // cascade_factor, cascade_min)
        x = fold_to(x, next_w, stage << 20)
        width = next_w
        stage += 1

    # -- fixed-shape butterfly scan tail over the remaining lanes (the max
    # lands in lane 0)
    k_tail = int(math.ceil(math.log2(width))) if width > 1 else 0
    if k_tail:
        strides = jnp.array(
            [width >> (i + 1) for i in range(k_tail)], dtype=jnp.int32
        )

        def body(carry, inputs):
            stride, idx = inputs
            with _rng.fork(idx):
                rolled = carry.roll(-stride, dims=carry.dim() - 1)
                new = _tournament_select(carry, rolled, fused)
            return new, None

        out, _ = lax.scan(body, x, (strides, jnp.arange(k_tail)))
    else:
        out = x
    # max now lives in lane 0 of the last axis
    idxr = [slice(None)] * out.dim()
    idxr[out.dim() - 1] = 0
    result = out[tuple(idxr)]
    # remaining axes are already in the original order (reduce axis was
    # moved to the end with a stable permutation)
    return result


def _max_helper_all_tree_reductions(enc_tensor, dim=None, method="log_reduction"):
    if method == "log_reduction":
        return _max_helper_log_reduction(enc_tensor, dim)
    if method == "double_log_reduction":
        return _max_helper_double_log_reduction(enc_tensor, dim)
    if method == "accelerated_cascade":
        return _max_helper_accelerated_cascade(enc_tensor, dim)
    if method == "scan_reduction":
        return _max_helper_scan_reduction(enc_tensor, dim)
    raise RuntimeError("Unknown max method")


def _argmax_helper_all_tree_reductions(enc_tensor, dim=None, method="log_reduction"):
    enc_max_vec = _max_helper_all_tree_reductions(enc_tensor, dim=dim, method=method)
    enc_max_vec_orig = enc_max_vec.unsqueeze(dim) if dim is not None else enc_max_vec
    enc_one_hot_vec = enc_tensor.eq(enc_max_vec_orig)
    return enc_one_hot_vec, enc_max_vec


def _argmax_helper(enc_tensor, dim=None, one_hot=True, method="pairwise", _return_max=False):
    if enc_tensor.dim() == 0:
        result = MPCTensor.encrypt(jnp.ones(()) if one_hot else jnp.zeros(()), src=0)
        return (result, None) if _return_max else result

    updated = enc_tensor.flatten() if dim is None else enc_tensor
    if method == "pairwise":
        result_args, result_val = _argmax_helper_pairwise(updated, dim)
    elif method in ("log_reduction", "double_log_reduction",
                    "accelerated_cascade", "scan_reduction"):
        result_args, result_val = _argmax_helper_all_tree_reductions(updated, dim, method)
    else:
        raise RuntimeError("Unknown argmax method")

    result_args = result_args.weighted_index(dim)
    result_args = result_args.view(enc_tensor.size()) if dim is None else result_args
    return (result_args, result_val) if _return_max else result_args


def _one_hot_to_index(tensor, dim, keepdim):
    if dim is None:
        flat = tensor.flatten()
        idx = jnp.arange(flat.size(0), dtype=jnp.float64)
        return flat.mul(idx).sum()
    size = [1] * tensor.dim()
    size[dim] = tensor.size(dim)
    idx = jnp.arange(tensor.size(dim), dtype=jnp.float64).reshape(size)
    return tensor.mul(idx).sum(axis=dim, keepdim=keepdim)


for _name, _fn in (("argmax", argmax), ("argmin", argmin), ("max", max),
                   ("min", min), ("max_value", max_value)):
    setattr(MPCTensor, _name, _fn)
