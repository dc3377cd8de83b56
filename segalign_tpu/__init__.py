"""segalign_tpu: TPU-native whole-genome aligner (SegAlign capabilities).

Importing the package configures JAX's persistent compilation cache: the
pipeline uses a fixed set of kernel shapes, so cross-process cache hits
eliminate the (TPU-expensive) compile warmup.
"""

import os


def _setup_jax_cache():
    cache = os.environ.get("SEGALIGN_JAX_CACHE",
                           os.path.expanduser("~/.cache/segalign_jax"))
    try:
        os.makedirs(cache, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_jax_cache()
