"""segalign_tpu: TPU-native whole-genome aligner (SegAlign capabilities).

JAX's persistent compilation cache is ON by default (defaults to
~/.cache/segalign_jax; override the path with SEGALIGN_JAX_CACHE=/path,
disable with SEGALIGN_JAX_CACHE=0). The pipeline's executable set is
large (per-pow2-class extension/compaction programs) and remote TPU
compiles are tens of seconds each; the cache takes a cold 4 Mbp bench
from 27 s to 15 s wall and makes every subsequent process start warm.
Re-validated round 4 on the axon remote-compile backend (byte-identical
HSPs cold vs warm); an earlier round saw stale-cache buffer-signature
failures — if those ever recur, delete the cache dir or set
SEGALIGN_JAX_CACHE=0.
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


def _machine_tag() -> str:
    """Short fingerprint of the host CPU's feature set.

    XLA:CPU AOT artifacts embed the compile machine's feature list but the
    persistent-cache KEY does not include it, so a cache dir shared across
    heterogeneous hosts serves mismatched code (cpu_aot_loader warns of
    SIGILL risk — observed here round 4). Keying the dir by the cpuinfo
    flags hash makes each machine type its own cache; TPU executables are
    keyed by chip type inside XLA already, so they lose nothing."""
    import hashlib
    import platform
    tag = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h = hashlib.sha1(line.encode()).hexdigest()[:10]
                    return f"{tag}-{h}"
    except OSError:
        pass
    return tag


def _setup_jax_cache():
    cache = os.environ.get("SEGALIGN_JAX_CACHE", "")
    if cache in ("0", "off", "none"):
        return
    # CPU-only processes (tests, dryruns) skip the persistent cache
    # entirely: local CPU compiles are fast, and XLA:CPU AOT entries
    # carry tuning pseudo-features (+prefer-no-gather, ...) that trip
    # the loader's machine check even on the machine that wrote them.
    # Accelerator processes — where remote compiles cost tens of
    # seconds — keep the cache.
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and all(p.strip() == "cpu"
                     for p in plats.split(",") if p.strip()):
        return
    if not cache:
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "segalign_jax", _machine_tag())
    try:
        os.makedirs(cache, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_malloc_reuse()
_setup_jax_cache()
