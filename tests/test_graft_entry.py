"""Driver contract: entry() compiles single-device; dryrun_multichip runs
a full sharded train step on an 8-device mesh.

The in-process tests run under the conftest environment (CPU backend with 8
virtual devices, so dryrun executes inline). test_dryrun_multichip_ambient
additionally replays the DRIVER's exact invocation: a clean subprocess with
the conftest env stripped, where the ambient platform (the one real axon TPU
on this host) has < 8 devices and dryrun_multichip must self-bootstrap its
own CPU mesh — the round-1 MULTICHIP failure mode."""

import os
import subprocess
import sys

import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_graft():
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    return ge


def test_entry_jittable():
    ge = _load_graft()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 100)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.slow
def test_dryrun_multichip_8():
    # Inline path: conftest provides 8 virtual CPU devices.
    ge = _load_graft()
    ge.dryrun_multichip(8)


@pytest.mark.slow  # subprocess bootstrap recompiles every family (~70 s);
def test_dryrun_multichip_2():  # the driver runs the dryrun itself anyway
    ge = _load_graft()
    ge.dryrun_multichip(2)


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_when_devices_short():
    # Force the bootstrap path even though 8 devices exist: ask for more
    # than the conftest mesh provides. The subprocess must build a 16-device
    # CPU mesh and run the sharded step.
    ge = _load_graft()
    ge.dryrun_multichip(16)


@pytest.mark.slow
def test_dryrun_multichip_ambient():
    """Replay the driver: clean subprocess, conftest env stripped, ambient
    platform. This is the test that would have caught MULTICHIP_r01."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORM_NAME", None)  # conftest's CPU pin
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"ambient dryrun failed:\nstdout={proc.stdout[-2000:]}\n"
        f"stderr={proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip OK" in proc.stdout


@pytest.mark.slow
def test_bench_ambient_contract():
    """bench.py must print one parseable JSON line under the AMBIENT
    platform (the driver's exact invocation), not just under the conftest
    CPU environment."""
    import json

    env = dict(os.environ)
    env.pop("JAX_PLATFORM_NAME", None)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    proc = subprocess.run(
        [sys.executable, "bench.py", "--steps", "2", "--warmup", "1"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
