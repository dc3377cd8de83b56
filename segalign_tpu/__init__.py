"""segalign_tpu: TPU-native whole-genome aligner (SegAlign capabilities).

Set SEGALIGN_JAX_CACHE=/path to opt into JAX's persistent compilation
cache. It is OFF by default: under the axon remote-compile backend the
cache reloads executables with mismatched buffer signatures ("supplied 9
buffers but compiled program expected 10") and machine-mismatched CPU AOT
code — both produce spurious INVALID_ARGUMENT failures at run time.
"""

import os


def _setup_jax_cache():
    cache = os.environ.get("SEGALIGN_JAX_CACHE", "")
    if not cache:
        return
    try:
        os.makedirs(cache, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_jax_cache()
