from __future__ import annotations

import pytest

from qdrant_datafusion_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="qdrant-datafusion-spark-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
