"""Import every query module so registration side effects run."""

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

__all__ = ["QUERIES", "ORACLES", "query"]
