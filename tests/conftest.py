from __future__ import annotations

import pytest

from currency_market_pulse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cmp-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
