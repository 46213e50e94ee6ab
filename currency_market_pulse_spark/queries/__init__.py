"""Import every query module so registration side effects run.

Two tiers (round 2): QUERIES/ORACLES is the driver-visible registry,
capped at 50 entries so every one lands inside the driver's
correctness window; EXTRA_QUERIES/EXTRA_ORACLES (registry.py) hold the
library-tier variants, differential-tested by
tests/test_extra_queries.py and `tools/selfcheck.py --extra`.
"""

from currency_market_pulse_spark.queries.registry import QUERIES, ORACLES, query

from currency_market_pulse_spark.queries import trades  # noqa: E402,F401
from currency_market_pulse_spark.queries import relational  # noqa: E402,F401
from currency_market_pulse_spark.queries import dedup  # noqa: E402,F401
from currency_market_pulse_spark.queries import similarity  # noqa: E402,F401
from currency_market_pulse_spark.queries import text  # noqa: E402,F401
from currency_market_pulse_spark.queries import multimodal  # noqa: E402,F401
from currency_market_pulse_spark.queries import sessions  # noqa: E402,F401
from currency_market_pulse_spark.queries import analytics  # noqa: E402,F401
from currency_market_pulse_spark.queries import subqueries  # noqa: E402,F401
from currency_market_pulse_spark.queries import timeseries  # noqa: E402,F401
from currency_market_pulse_spark.queries import ivf  # noqa: E402,F401
from currency_market_pulse_spark.queries import sampling  # noqa: E402,F401
from currency_market_pulse_spark.queries import packing  # noqa: E402,F401
from currency_market_pulse_spark.queries import decontam  # noqa: E402,F401
from currency_market_pulse_spark.queries import profile  # noqa: E402,F401
from currency_market_pulse_spark.queries import pipeline  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
