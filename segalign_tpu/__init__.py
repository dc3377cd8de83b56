"""segalign_tpu: TPU-native whole-genome aligner (SegAlign capabilities).

Set SEGALIGN_JAX_CACHE=/path to opt into JAX's persistent compilation
cache. It is OFF by default: under the axon remote-compile backend the
cache reloads executables with mismatched buffer signatures ("supplied 9
buffers but compiled program expected 10") and machine-mismatched CPU AOT
code — both produce spurious INVALID_ARGUMENT failures at run time.
"""

import os


def _setup_malloc_reuse():
    """Keep freed pages in the process (glibc mallopt).

    On lazily-restored VMs (and some cloud sandboxes) first-touch page
    faults are served by a userspace handler at single-digit MB/s. glibc's
    default policy mmap()s large allocations and returns them to the OS on
    free, so every large numpy array re-pays that fault cost. Forcing all
    allocations onto the heap (M_MMAP_MAX=0) and disabling trim makes the
    cost once-per-process. Measured here: repeated 128 MB cumsum 24-56 s
    -> 0.2 s. Opt out with SEGALIGN_MALLOC_REUSE=0.
    """
    if os.environ.get("SEGALIGN_MALLOC_REUSE", "1") != "1":
        return
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-4, 0)          # M_MMAP_MAX = 0
        libc.mallopt(-1, 2**31 - 1)  # M_TRIM_THRESHOLD = never
    except Exception:  # pragma: no cover - non-glibc platforms
        pass


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


_setup_malloc_reuse()
_setup_jax_cache()
