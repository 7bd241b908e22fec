"""Test harness: CPU backend with 8 simulated devices (SURVEY §4.5).

Must run before any jax import. ``JAX_PLATFORM_NAME`` (not ``JAX_PLATFORMS``)
is what overrides the axon TPU plugin in this environment.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter startup (before this
# conftest), so env vars alone are too late — use the config API, which
# works post-import as long as no backend has initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-bound on this
# 1-core host (mesh train-step compiles are 8-20 s each), and test programs
# are byte-identical across runs.  A warm cache cuts the fast-tier wall
# time ~3x; the dir is repo-local and gitignored.  min_compile_time keeps
# trivial sub-second programs out of the cache.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(autouse=True)
def _no_mesh_leak():
    """The active-mesh context (kanvit.parallel.runtime) is process-global;
    a test that activates it without the context manager must not bleed
    into later tests (a leaked (4,2) mesh silently changes kernel
    dispatch — caught once with the dryrun leaking into a lanes test)."""
    yield
    from kanvit.parallel import runtime

    runtime.activate_mesh(None)


@pytest.fixture(scope="session")
def goldens_dir():
    return GOLDENS


def load_golden(name):
    path = os.path.join(GOLDENS, f"{name}.npz")
    data = dict(np.load(path))
    sd = {k[3:]: v for k, v in data.items() if k.startswith("sd.")}
    rest = {k: v for k, v in data.items() if not k.startswith("sd.")}
    return rest, sd
