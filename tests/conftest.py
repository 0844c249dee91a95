"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* (the standard JAX fake-backend
trick — SURVEY.md §4) so multi-chip sharding paths are exercised without TPU
hardware. In this container the axon TPU PJRT plugin is registered by a
sitecustomize hook at interpreter startup and deadlocks any process that then
selects the CPU platform, so we scrub the axon environment and re-exec the
interpreter once, before jax is imported anywhere.
"""

import os
import sys

_MARKER = "NEURONIKA_TPU_TEST_REEXEC"


def _needs_reexec() -> bool:
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and not os.environ.get(
        _MARKER
    )


def pytest_configure(config):
    """Re-exec pytest with the axon plugin disabled and a CPU mesh forced.

    Runs from pytest_configure (not module import) so we can release
    pytest's fd-level output capture first — otherwise the re-exec'd run
    writes into the abandoned capture file and appears silent."""
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy test (>= 3 s in the full-suite duration "
        "profile, tests/slow_tests.txt); `-m 'not slow'` is the <3 min "
        "smoke tier")
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env[_MARKER] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native (C++) tier in-place when a toolchain is present, so the
# walker / CSV fast-path tests run against real extensions instead of
# skipping (the Python fallbacks still cover toolchain-less environments).
try:
    from neuronika_tpu._build import ensure_native_built

    ensure_native_built()
except Exception:  # noqa: BLE001 - never block the test run on a build
    pass

def pytest_collection_modifyitems(config, items):
    """Apply the `slow` marker from the checked-in duration profile
    (tests/slow_tests.txt — one `file::function` per line, parametrized
    cases inherit their function's mark). Data-driven so the smoke tier
    tracks reality: regenerate with tools/mark_slow.py after the suite's
    shape changes."""
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(path) as f:
            slow = {ln.strip() for ln in f
                    if ln.strip() and not ln.startswith("#")}
    except OSError:
        return
    root = str(config.rootpath)
    for item in items:
        nodeid = item.nodeid.split("[")[0]
        if nodeid in slow or os.path.relpath(
                os.path.join(root, nodeid), root) in slow:
            item.add_marker(pytest.mark.slow)


# Reference numeric tolerance: F16_EPSILON = 4.88e-4
# (neuronika-variable/src/utils.rs:500-517). We target the tighter 1e-5 from
# BASELINE.md for f32 ops and keep the reference tolerance for goldens.
TOL = 1e-5
REF_TOL = 4.88e-4


@pytest.fixture(autouse=True)
def _seeded():
    import neuronika_tpu as nk

    nk.seed(0)
    np.random.seed(0)
    yield


def assert_close(a, b, tol=TOL):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol, atol=tol)
