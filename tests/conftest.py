from __future__ import annotations

import pytest

from mlvectordb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mlvectordb-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
