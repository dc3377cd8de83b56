"""TPU-friendly scans.

XLA's TPU lowering of 1-D cumulative ops degenerates on large arrays
(compile time explodes somewhere past ~10^5 elements). All long scans in the
pipeline use this blocked 2-D formulation instead: lane-axis cumsums within
rows plus a short second-level scan of row totals.
"""

from __future__ import annotations

import jax.numpy as jnp


def blocked_cumsum(x, block: int = 2048):
    """Inclusive 1-D cumsum via 2-D blocking. Exact for int dtypes."""
    n = x.shape[0]
    if n <= 1 << 15:
        return jnp.cumsum(x, dtype=x.dtype)
    m = -(-n // block)
    pad = m * block - n
    xp = jnp.pad(x, (0, pad))
    cs = jnp.cumsum(xp.reshape(m, block), axis=1, dtype=x.dtype)
    tot = cs[:, -1]
    if m > 1 << 15:
        off = blocked_cumsum(tot, block) - tot
    else:
        off = jnp.cumsum(tot, dtype=x.dtype) - tot
    return (cs + off[:, None]).reshape(-1)[:n]
