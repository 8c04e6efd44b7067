"""Cross-device collectives for exact fraction minima.

XLA's built-in reduction collectives (psum/pmax) can't carry the exact rational
comparator, so the global winner is combined by all-gathering each shard's winner
triple (n, d, index) — 12 bytes per query per shard over ICI — and reducing with the
same exact comparator used on-chip. This is the TPU equivalent of the coordinator's
running argmin over participant streams (reference src/main.rs:581-626), but it stays
device-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpc_iris_tpu.ops.decode import fraction_min_rotations


def fraction_allmin(n, d, idx, axis_name: str):
    """All-reduce an exact fraction minimum over a mesh axis.

    Args:
      n, d, idx: int32 [...] per-shard winner triples (d == 0 means invalid/+inf).
      axis_name: mesh axis to reduce over.

    Returns (n, d, idx) replicated across the axis: the global minimum fraction,
    ties keeping the smallest index.
    """
    # [A, ...] gathered along a new leading axis.
    gn = jax.lax.all_gather(n, axis_name)
    gd = jax.lax.all_gather(d, axis_name)
    gi = jax.lax.all_gather(idx, axis_name)
    # Reuse the static tree-select; tie-break on idx is handled by _frac_select,
    # but fraction_min_rotations ties break toward the lower *gather slot*, so order
    # the gather by index explicitly: slots are shard ranks, and global indices are
    # monotone in shard rank (block distribution), so slot order == index order.
    best_n, best_d, slot = fraction_min_rotations(gn, gd, axis=0)
    best_i = jnp.take_along_axis(gi, slot[None, ...], axis=0)[0]
    return best_n, best_d, best_i
