from __future__ import annotations

import pytest

from rdfproject_msc_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="tests", cpus=4)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
