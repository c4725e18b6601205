"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on the host platform with
``--xla_force_host_platform_device_count=8`` (the standard JAX fake-backend
trick; the reference has no distributed tests to model, SURVEY.md section 4).
Must run before the first ``import jax``.

Set ``RADAR_SLAM_TEST_TPU=1`` to run on the ambient (TPU/axon) backend
instead -- this is how the ``@skipif(platform not in ("tpu", "axon"))``
chip-numerics tests actually execute (the round-3 in-kernel-PRNG NaN bug
was invisible to interpret mode and WOULD have been caught by
``test_noise_seeding_on_tpu``, which the CPU-forced suite always skipped):

    RADAR_SLAM_TEST_TPU=1 python -m pytest tests/test_synthpower.py \
        tests/test_ops_pallas.py -q -k "tpu or compiled"
"""

import os
import sys

_ON_TPU = os.environ.get("RADAR_SLAM_TEST_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not _ON_TPU:
    # The container's sitecustomize registers the axon TPU backend and
    # forces JAX_PLATFORMS=axon; override after import so tests run on the
    # virtual 8-device CPU mesh.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    assert jax.devices()[0].platform == "cpu", jax.devices()
else:
    jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (the full tier; also RADAR_SLAM_FULL=1)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy (>~7 s) tests -- skipped by default so the iteration "
        "suite stays under ~5 min; run the full tier with --runslow or "
        "RADAR_SLAM_FULL=1 (VERDICT r03 item 9)")


def pytest_collection_modifyitems(config, items):
    if (config.getoption("--runslow")
            or os.environ.get("RADAR_SLAM_FULL") == "1"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: run with --runslow or RADAR_SLAM_FULL=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    """Drop jax's executable/tracing caches every ~30 tests.

    XLA:CPU's compiler segfaulted reproducibly (three times, in
    `backend_compile_and_load`, at whichever heavy jit happened to land
    past the ~180-accumulated-executables mark of a full-suite run) while
    every shorter run passes.  Periodic clearing keeps the compiler
    inside whatever per-process resource pool it exhausts; the cost is a
    few recompiles of shared programs per suite."""
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % 30 == 0:
        jax.clear_caches()


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
