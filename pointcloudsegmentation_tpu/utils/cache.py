"""Persistent XLA compilation cache.

First compile of the full train step via the remote TPU tunnel takes
minutes; the persistent cache makes every later process start instantly.
Call early (before the first jit execution).

The cache directory is keyed by a HOST SIGNATURE (CPU feature flags): the
repo checkout — and its cache — can move between machines, and XLA:CPU AOT
executables embed the compile host's vector ISA (AVX-512/AMX sets).  A
stale entry from a different host aborts on load (observed SIGABRT in the
CPU-mesh dryrun); keying by the actual /proc/cpuinfo flags keeps warm
compiles per host without cross-machine reuse.  TPU executables are
host-independent, but a per-host key merely costs one warm-up per machine.
"""
import hashlib
import os
import platform

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def host_signature() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags_line = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags_line = ""
    return hashlib.md5("|".join(
        [platform.machine(), platform.processor(), platform.release(),
         flags_line]).encode()).hexdigest()[:12]


def enable(path: str | None = None) -> str:
    if os.environ.get("PCS_DISABLE_PERSISTENT_CACHE") == "1":
        # XLA:CPU AOT artifacts are rejected at load time whenever the
        # compile-feature string disagrees with the runtime-detected host
        # features — observed even same-host, because XLA appends tuning
        # pseudo-features (+prefer-no-gather/+prefer-no-scatter) to the
        # compile set that the runtime detector never reports (see
        # MULTICHIP_r04 tail).  Each rejected load costs a deserialize +
        # full recompile, so for the CPU-mesh dryrun a persistent cache is
        # strictly worse than one honest cold compile.
        return ""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    path = os.path.join(path, f"host-{host_signature()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
