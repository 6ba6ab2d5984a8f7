"""True device-completion barrier for benchmark timing.

On remote-attached (tunneled) TPU backends, `Array.block_until_ready()` /
`jax.block_until_ready()` can return as soon as the remote buffer future
is registered — long before the device has executed the queued programs.
Measured on this host's tunnel: 8 chained 8192^3 bf16 matmuls "completed"
in 0.09 ms under block_until_ready (an impossible 103,000 TF/s), while a
scalar fetch of the same result took 77 ms (169 TF/s ~= 86% of the v5e's
197 TF/s bf16 peak — the plausible number). A benchmark loop that trusts
block_until_ready therefore measures DISPATCH rate, not throughput.

`hard_block(x)` forces real completion: it dispatches a tiny reduction
that data-depends on `x` and fetches the scalar to the host. The device
executes its queue in order, so the fetch completing implies every
program queued up to and including `x`'s producer has executed. Cost: one
extra tiny dispatch + one host round-trip (~25 ms through the tunnel) —
amortize it over a batch of timed work, never per-iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hard_block(x) -> None:
    """Block until every program feeding `x` (a pytree) has executed."""
    leaves = [leaf for leaf in jax.tree.leaves(x)
              if isinstance(leaf, jax.Array)]
    if not leaves:
        return
    # summing only the LAST leaf would be enough on a single in-order
    # device stream, but donated/multi-stream futures make that fragile;
    # one fused scalar over a tiny slice of every leaf is still one fetch
    total = jnp.asarray(0.0, jnp.float32)
    for leaf in leaves:
        flat = leaf.reshape(-1)
        total = total + flat[0].astype(jnp.float32)
    np.asarray(total)  # D2H scalar: returns only after execution
