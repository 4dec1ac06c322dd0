"""Persistent XLA compilation cache.

The reference's torch models pay no compile cost; under jit, tpuasr's
cold-start is dominated by XLA compilation (~20-40 s per new shape on the
TPU, seconds per program on CPU). Enabling JAX's persistent cache makes
every CLI invocation, benchmark re-run, and repeated test run reuse
compiled executables across processes: predict.py cold-start drops from
tens of seconds to roughly the model's execution time.

Opt out with TPUASR_JAX_CACHE=0; point elsewhere with TPUASR_JAX_CACHE=/path.
"""

from __future__ import annotations

import hashlib
import os
import platform
from pathlib import Path

_DEFAULT = Path.home() / ".cache" / "tpuasr" / "jax"
_enabled = False


def _host_fingerprint() -> str:
    """Stable fingerprint of this host's CPU feature set.

    XLA:CPU caches AOT-compiled machine code whose cache key does NOT
    include the host's CPU features; an entry compiled on a host with a
    different feature set (e.g. avx512 + prefer-no-scatter) loads with a
    cpu_aot_loader machine-mismatch warning and can then SIGILL/SIGSEGV
    (measured: a segfault inside get_executable_and_time killed the test
    suite mid-run after the sandbox moved hosts). Scoping the cache dir by
    this fingerprint makes cross-host entries invisible instead of fatal.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = ""
    except OSError:
        feats = ""
    digest = hashlib.sha256(
        (platform.machine() + "|" + feats).encode()).hexdigest()
    return f"h-{digest[:12]}"


def _repair_lru_metadata(path: Path) -> None:
    """Backfill `-atime` twins for entries written before the LRU bound.

    jax's LRUCache (used once jax_compilation_cache_max_size is set) reads
    `<key>-atime` for EVERY `<key>-cache` file on each put; a single entry
    written by the unbounded cache (no atime twin) makes every subsequent
    put raise FileNotFoundError, so nothing new is ever cached and the dir
    never shrinks. Seed missing twins with the entry's mtime so real LRU
    order is preserved, and drop dangling atime files.
    """
    try:
        for cache_file in path.glob("*-cache"):
            atime = path / (cache_file.name[: -len("-cache")] + "-atime")
            if not atime.exists():
                ts = int(cache_file.stat().st_mtime * 1e9)
                atime.write_bytes(ts.to_bytes(8, "little"))
        for atime_file in path.glob("*-atime"):
            cache = path / (atime_file.name[: -len("-atime")] + "-cache")
            if not cache.exists():
                atime_file.unlink()
    except OSError:  # pragma: no cover - repair is best-effort
        pass


def enable_compilation_cache() -> str | None:
    """Idempotently turn on JAX's persistent compilation cache.

    Returns the cache dir, or None when disabled via TPUASR_JAX_CACHE=0.
    Safe to call before or after backend initialization.
    """
    global _enabled
    env = os.environ.get("TPUASR_JAX_CACHE", "")
    if env == "0":
        return None
    # CPU backend: OFF by default. XLA:CPU executable (de)serialization is
    # unstable once a process accumulates enough compilations — measured
    # round-3: two SIGSEGVs (one GET, one PUT) and one futex deadlock, all
    # inside the persistent-cache layer, none reproducible in isolation,
    # and a cache-disabled single-process full run is clean. The cache's
    # big win is TPU compiles (~20-40 s each) anyway; CPU compiles are
    # seconds. TPUASR_JAX_CACHE_CPU=1 opts back in for local iteration.
    import jax

    plat = (jax.config.jax_platforms
            or os.environ.get("TPUASR_PLATFORM") or "")
    base = Path(env) if env else _DEFAULT
    if str(plat).split(",")[0] == "cpu":
        if os.environ.get("TPUASR_JAX_CACHE_CPU") != "1":
            return None
        # CPU opt-in: host-feature subdirectory, so entries AOT-compiled
        # by a host with a different CPU feature set never load (see
        # _host_fingerprint).
        path = base / _host_fingerprint()
    else:
        # TPU: serialized executables are not host-CPU-feature sensitive;
        # keep the stable dir so warm entries survive host moves (losing
        # them costs 20-40 s per program on the next chip session).
        path = base
    if _enabled:
        return str(path)
    try:
        path.mkdir(parents=True, exist_ok=True)
        _repair_lru_metadata(path)
        import jax

        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache everything: the default thresholds skip small/fast programs,
        # but the test suite's cost is exactly many small CPU programs.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        # Bound on-disk growth: JAX's LRU eviction keeps the dir under 2 GB
        # (advisor r2: with the thresholds above and no bound, the dir grew
        # without limit). TPUASR_JAX_CACHE_MAX_MB overrides.
        max_mb = int(os.environ.get("TPUASR_JAX_CACHE_MAX_MB", "2048"))
        jax.config.update("jax_compilation_cache_max_size",
                          max_mb * 1024 * 1024)
        _enabled = True
        return str(path)
    except Exception:  # pragma: no cover - cache is best-effort
        return None
