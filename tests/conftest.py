"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-device sharding paths (data-parallel mesh, collectives, dryrun of the
multi-chip training step) are exercised on a virtual 8-device CPU mesh, the
TPU-native equivalent of the reference's pod-only multi-host testing gap
(reference has no tests at all; see SURVEY.md section 4).

The environment may pre-register a TPU backend via sitecustomize before
pytest starts, so setting JAX_PLATFORMS here is not enough: we update the
already-imported jax config before any backend is instantiated. Set
DDPO_TPU_TEST_BACKEND=native to run the suite on the real device instead.
"""

import os

if os.environ.get("DDPO_TPU_TEST_BACKEND", "cpu") == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache across test runs: the heavyweight tests (tiny-stack
# pipeline runs, dp-equivalence, the multichip dryrun) spend most of their
# wall time in XLA compilation of identical programs.
import jax as _jax  # noqa: E402


def _machine_tag() -> str:
    """Fingerprint of this host's CPU features for the cache path.

    XLA:CPU AOT artifacts bake in the compile machine's instruction set;
    loading an entry produced on a different host (e.g. an AMX-capable VM
    from a previous session) is at best a warning and at worst a DIFFERENT
    executable than a fresh compile — in one observed failure, worker 0
    loaded foreign-machine executables while worker 1 compiled fresh, and
    the two processes' collective streams crossed (train-infos allgather
    returned another tensor's bytes). Scoping the cache dir by machine
    makes entries unshareable across host types. The flags line alone is
    NOT enough: two VM generations here (Sapphire vs Emerald Rapids)
    advertise identical flags yet XLA derives different target features
    (prefer-no-gather) from CPUID — include family/model/stepping, which
    virtualization passes through.
    """
    import hashlib
    import platform

    keys = ("flags", "cpu family", "model\t", "model :", "stepping")
    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for l in f:
                if any(l.startswith(k) for k in keys):
                    lines.append(l)
                if len(lines) >= 4:
                    break
    except OSError:
        pass
    return hashlib.sha1(
        (platform.machine() + "".join(lines)).encode()
    ).hexdigest()[:8]


_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), f".jax_cache-{_machine_tag()}"
)
_jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
# persist EVERYTHING: suite profiling (JAX_LOG_COMPILES on the heavy tests)
# showed ~1.5k eager micro-compiles of 40-100ms each per test module —
# un-jitted model.init, scheduler math — totaling more wall time than the
# big jitted programs; at threshold 0 they all become disk hits
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
# Driver e2e tests re-point the cache via Parser._enable_compile_cache; route
# them to the SAME shared cache (each test's tmp cwd would otherwise start a
# fresh, always-cold one — measured as the dominant suite cost).
os.environ.setdefault("DDPO_TPU_COMPILE_CACHE", _CACHE_DIR)

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="also run tests marked slow (>60s end-to-end paths)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >60s end-to-end test, deselected by default (--slow)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
