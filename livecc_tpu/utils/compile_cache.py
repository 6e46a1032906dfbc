"""Machine-scoped persistent compilation cache paths.

XLA:CPU AOT executables are compiled for the build host's exact vector
features; loading them on a different CPU only WARNS ("Machine type used
for XLA:CPU compilation doesn't match") and then aborts mid-execution
(SIGABRT/SIGILL class — observed in round 3 when this environment's VM
moved to a host without avx512-prefer flags and replayed the previous
host's cache). Every persistent cache this repo configures (tests, bench,
dryrun) therefore includes a hash of the host CPU's feature flags: each
machine builds and reuses its own executables, and a machine change costs
one rebuild instead of a crash.

JAX's DEFAULT cache (~/.cache/jax) has the same hazard and is outside our
control — ``enable_machine_scoped_cache`` points jax at a scoped dir
explicitly, which also overrides the default.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_tag() -> str:
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(f"{platform.machine()}|{feats}".encode()).hexdigest()[:12]


def machine_scoped_cache_dir(base: str) -> str:
    return os.path.join(base, machine_tag())


def enable_machine_scoped_cache(base: str = "/tmp/tpu_cache") -> str:
    """Point jax's persistent compilation cache at a per-machine dir.

    Call BEFORE the first compilation. Respects an explicit
    JAX_COMPILATION_CACHE_DIR by scoping inside it."""
    import jax

    base = os.environ.get("JAX_COMPILATION_CACHE_DIR", base)
    path = machine_scoped_cache_dir(base)
    # jax does not create a missing cache dir — every write then fails with
    # a FileNotFoundError warning and nothing persists
    os.makedirs(path, exist_ok=True)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    jax.config.update("jax_compilation_cache_dir", path)
    return path
