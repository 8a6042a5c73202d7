"""Test configuration: force a virtual 8-device CPU mesh so sharding tests
run anywhere (mirrors the driver's dryrun_multichip environment)."""

import os
import sys

# Absolute paths for repo-root (client.py, server.py) and tests/
# (torch_oracles) imports: relative/cwd-dependent entries are the source
# of the order-dependent ModuleNotFoundError flake under full serial runs
# (VERDICT round 2 item 10).
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TESTS_DIR)
for _p in (_REPO_ROOT, _TESTS_DIR):
    if _p not in sys.path:
        sys.path.insert(0, _p)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# the environment's sitecustomize force-registers the TPU platform and
# overrides JAX_PLATFORMS from the env; the config update below wins.
jax.config.update("jax_platforms", "cpu")
# NOTE: no persistent compilation cache here — this jaxlib's CPU
# executable (de)serialization is unreliable across host profiles
# (SIGSEGV on read, SIGABRT on write); the TPU bench keeps its own cache.


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules. A full-suite run
    accumulates ~1000 jitted programs; this jaxlib's CPU backend segfaults
    inside LLVM once that many executables are live in one process
    (resource exhaustion), so we drop them at module boundaries."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
