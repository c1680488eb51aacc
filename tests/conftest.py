from __future__ import annotations

import pytest

from azuredatalakeindexer_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cpus=8)
    yield s
    s.stop()
