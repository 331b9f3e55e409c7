"""Honest device-synchronized timing helpers.

On the remote 'axon' TPU platform ``jax.block_until_ready`` returns before
device execution completes (the round-1 ~5,000x benchmark artifact). The
only reliable completion barrier is a device->host fetch: reduce the output
ON DEVICE and pull the scalar to host — the fetch cannot return until the
whole program has run. Use ``device_sync`` after every timed step.
"""

import jax
import numpy as np

_reduce_fn = None


def device_sync(out):
    """Block until `out` (array / MPCTensor / pytree) has actually been
    computed on device; returns an int digest of the first leaf."""
    global _reduce_fn
    if _reduce_fn is None:
        _reduce_fn = jax.jit(lambda s: s.sum())
    leaf = out
    if hasattr(leaf, "share"):
        leaf = leaf.share
    leaves = jax.tree_util.tree_leaves(leaf)
    return int(np.asarray(jax.device_get(_reduce_fn(leaves[0]))))
