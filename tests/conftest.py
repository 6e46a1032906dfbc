"""Test harness: force CPU backend with 8 virtual devices.

Multi-device sharding (data/model mesh, ZeRO-2 partitioning, TP) is exercised
on a fake 8-device CPU mesh — this must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env sets 'axon' (TPU)
# The axon sitecustomize registers the TPU plugin and overrides platform
# selection at import; jax.config below re-forces CPU (env alone is ignored).
# Zero-egress environment: stop transformers/HF hub from attempting (and
# timing out on) network calls.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # XLA:CPU collectives FATALLY exit ("Termination timeout for all
    # reduce ... Exiting to ensure a consistent program state", SIGABRT)
    # when a rendezvous participant misses the default 40 s window — on
    # this 1-throttled-vCPU host with 8 virtual devices a starved device
    # thread regularly does under suite load. This was the round-3 "Fatal
    # Python error: Aborted" in the mesh trainer tests. Give the
    # rendezvous room instead of dying.
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = _flags

# XLA:CPU's default matmul runs reduced precision (oneDNN bf16-ish), which
# breaks fp32 parity-vs-torch tests; force true fp32 accumulation in tests.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Cache compiled executables across test runs (XLA:CPU compiles of the scanned
# transformer take ~2 min cold). KEYED PER CPU TYPE: XLA:CPU AOT results baked
# for another machine's vector features load with only a warning and then
# crash mid-test (SIGABRT/SIGILL class — observed when this repo's cache,
# built on an avx512-richer host, was reused on a weaker one; the loader
# prints "Machine type used for XLA:CPU compilation doesn't match").
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from livecc_tpu.utils.compile_cache import machine_tag  # noqa: E402

_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache", machine_tag())

# Cache-poison guard (observed r5): a test run killed mid-compile can leave
# the shared cache in a state whose reload DEADLOCKS the next run (every
# thread futex-waits inside the first cached compile; a fresh dir compiles
# the same program in seconds). A sentinel marks a session in flight; a
# sentinel surviving process exit means the previous run was killed — wipe
# and rebuild rather than risk a hung suite.
_sentinel = os.path.join(_cache_dir, "INFLIGHT")
if os.path.exists(_sentinel):
    import shutil
    import sys as _sys

    print(f"[conftest] wiping compile cache poisoned by a killed run: "
          f"{_cache_dir}", file=_sys.stderr)
    shutil.rmtree(_cache_dir, ignore_errors=True)
os.makedirs(_cache_dir, exist_ok=True)
with open(_sentinel, "w") as _f:
    _f.write(str(os.getpid()))
import atexit  # noqa: E402

atexit.register(lambda: os.path.exists(_sentinel) and os.remove(_sentinel))

jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
