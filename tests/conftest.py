from __future__ import annotations

import pytest

from datafusion_python_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def spark_ctx():
    from datafusion_python_spark import SessionContext

    return SessionContext()
