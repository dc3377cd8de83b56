"""TPU-friendly scans.

XLA's TPU lowering of 1-D cumulative ops degenerates on large arrays
(compile time explodes somewhere past ~10^5 elements). All long scans in the
pipeline use this blocked 2-D formulation instead: lane-axis cumsums within
rows plus a short second-level scan of row totals.
"""

from __future__ import annotations

import jax.numpy as jnp


import os

# SEGALIGN_SYNC=1 restores round-1 behavior: synchronize after every wrapped
# dispatch and retry once (with a cleared trace cache) on the transient
# INVALID_ARGUMENT / buffer-count dispatch bugs this environment used to
# show. Off by default: the happy-path sync defeated JAX async dispatch and
# the underlying environment bugs no longer reproduce (round 2 probes).
_SYNC_RETRY = os.environ.get("SEGALIGN_SYNC", "") == "1"


def robust_call(fn, *args, **kw):
    """Dispatch a jitted function (see _SYNC_RETRY for the debug mode)."""
    if not _SYNC_RETRY:
        return fn(*args, **kw)
    import jax

    def run():
        out = fn(*args, **kw)
        # materialize so async execution errors surface inside the retry
        # scope
        jax.block_until_ready(out)
        return out

    try:
        return run()
    except Exception as e:
        msg = str(e)
        if "INVALID_ARGUMENT" not in msg and "buffers" not in msg:
            raise
        try:
            fn.clear_cache()
        except Exception:
            pass
        return run()


def sum1d(x, dtype=jnp.int32):
    """Reduce a long 1-D array without triggering the 1-D lowering cliff."""
    n = x.shape[0]
    if n <= 1 << 15:
        return jnp.sum(x, dtype=dtype)
    pad = (-n) % 512
    xp = jnp.pad(x.astype(dtype), (0, pad))
    return jnp.sum(xp.reshape(-1, 512), dtype=dtype)


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
