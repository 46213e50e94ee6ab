from __future__ import annotations

import pytest

from currency_market_pulse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

#: the library-tier oracle gate (tests/test_extra_queries.py) runs at
#: the DRIVER's correctness scale so the committed evidence matches the
#: gate of record (VERDICT r3 item 4b — sf0.001's join/edge cases are
#: an order of magnitude thinner).  Unit tests stay on sf0.001 for
#: speed.
EXTRA_SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cmp-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
