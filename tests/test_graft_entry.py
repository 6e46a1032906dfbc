"""Guard the driver contract: entry() compiles, dryrun_multichip runs."""

import jax
import pytest


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import os

    import __graft_entry__ as g

    # the 7B-width TP section takes ~8 min on this 1-vCPU host; exercised by
    # the driver's real invocation and (manually) via `python __graft_entry__.py`
    os.environ["LIVECC_DRYRUN_7B"] = "0"
    try:
        g.dryrun_multichip(8)
    finally:
        os.environ.pop("LIVECC_DRYRUN_7B", None)


def test_dryrun_multichip_bootstraps_from_one_device():
    """Reproduce the DRIVER's invocation: import __graft_entry__ in an env
    whose jax backend has a single device, then call dryrun_multichip.

    Round 1 failed exactly here (MULTICHIP_r01.json: `mesh 4x2 != 1 devices`)
    because the conftest-forced 8-device suite never exercised this path; the
    function must respawn itself with a virtual n-device CPU backend.
    """
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # Simulate the ambient single-device env (the real one is a 1-chip TPU).
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        [f for f in env.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
        + ["--xla_force_host_platform_device_count=1"]
    )
    env["PYTHONPATH"] = os.pathsep.join(p for p in [repo, env.get("PYTHONPATH", "")] if p)
    env["LIVECC_DRYRUN_7B"] = "0"   # keep the guard fast; mechanics identical
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "ok" in proc.stdout


def test_dryrun_timeboxes_slow_stage(tmp_path):
    """A stage whose compile/run overruns its time-box must degrade to a
    recorded SKIP, never a gate failure (VERDICT r4 weak #1: estimate
    gating could not preempt a running stage on a slow host-hour), AND the
    parent's own timeout-kill of an optional stage must KEEP the warm
    compile cache (r5: wiping there cold-looped every later run — the
    oversize 7b_tp_train stage timed out, the wipe sent every stage cold,
    so the next run timed out too). Simulate the slow host with
    LIVECC_DRYRUN_STAGE_SLEEP and a tiny per-stage cap."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        [f for f in env.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
        + ["--xla_force_host_platform_device_count=1"]
    )
    env["PYTHONPATH"] = os.pathsep.join(p for p in [repo, env.get("PYTHONPATH", "")] if p)
    env["LIVECC_DRYRUN_7B"] = "0"
    # both optional tiny stages sleep far past the 10 s cap -> killed + SKIP
    env["LIVECC_DRYRUN_STAGE_SLEEP"] = "seq_parallel:300,pipeline:300"
    env["LIVECC_DRYRUN_STAGE_CAP"] = "10"
    # a slow host-hour can burn the whole default budget on the mandatory
    # base compile, which would skip the optional stages as "budget
    # exhausted" BEFORE the time-box path under test is reached — give the
    # run a budget only the sleeps can threaten
    env["LIVECC_DRYRUN_BUDGET"] = "3600"
    # pre-warm a marker entry: the optional-stage timeout kills below must
    # NOT wipe it (only crashes and mandatory-stage failures wipe)
    from livecc_tpu.utils.compile_cache import machine_scoped_cache_dir

    base_dir = str(tmp_path / "cache")
    env["JAX_COMPILATION_CACHE_DIR"] = base_dir
    scoped = machine_scoped_cache_dir(base_dir)
    os.makedirs(scoped, exist_ok=True)
    marker = os.path.join(scoped, "jit_marker-warm-entry-cache")
    with open(marker, "w") as f:
        f.write("x")
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('GATE_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1800,
    )
    out = proc.stdout
    assert proc.returncode == 0, f"stdout:\n{out}\nstderr:\n{proc.stderr}"
    assert "GATE_OK" in out
    assert "DONE  base" in out, out
    assert "SKIP  seq_parallel: timed out" in out, out
    assert "SKIP  pipeline: timed out" in out, out
    assert "keeping warm cache" in out, out
    assert "cache wipe" not in out, out
    assert os.path.exists(marker), (
        "optional-stage timeout must not wipe the warm cache")
    assert not os.path.exists(os.path.join(scoped, "INFLIGHT")), (
        "sentinel must be cleared on the keep-warm path")


def test_dryrun_stale_sentinel_keeps_cache(tmp_path):
    """A stale INFLIGHT sentinel (parent killed mid-stage, e.g. by the
    driver's deadline) must NOT wipe the persistent compile cache: the warm
    7B-stage executables are what let those stages finish inside the budget
    (cold 7b_tp_train measured 1990 s on this host), and a genuinely
    poisoned entry is already bounded by the per-stage time-box + wipe on
    abnormal exit. The sentinel itself must be cleared."""
    import os
    import subprocess
    import sys

    from livecc_tpu.utils.compile_cache import machine_scoped_cache_dir

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_dir = str(tmp_path / "cache")
    scoped = machine_scoped_cache_dir(base_dir)
    os.makedirs(scoped, exist_ok=True)
    with open(os.path.join(scoped, "INFLIGHT"), "w") as f:
        f.write("7b_tp_train")
    marker = os.path.join(scoped, "jit_marker-warm-entry-cache")
    with open(marker, "w") as f:
        f.write("warm")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        [f for f in env.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
        + ["--xla_force_host_platform_device_count=1"]
    )
    env["PYTHONPATH"] = os.pathsep.join(p for p in [repo, env.get("PYTHONPATH", "")] if p)
    env["LIVECC_DRYRUN_7B"] = "0"
    env["JAX_COMPILATION_CACHE_DIR"] = base_dir
    # after base, <60 s remain -> optional stages skip: one-stage test
    env["LIVECC_DRYRUN_BUDGET"] = "1"
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('GATE_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1800,
    )
    out = proc.stdout
    assert proc.returncode == 0, f"stdout:\n{out}\nstderr:\n{proc.stderr}"
    assert "GATE_OK" in out
    assert "DONE  base" in out, out
    assert "keeping the warm cache" in out, out
    assert os.path.exists(marker), "stale sentinel must not wipe the cache"
    assert not os.path.exists(os.path.join(scoped, "INFLIGHT"))
