from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from lsh_spark.plans import get_spark

    s = get_spark(app_name="lsh_spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()
