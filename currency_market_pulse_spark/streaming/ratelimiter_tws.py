"""Sliding-window rate limiter on the transformWithStateInPandas API
(Spark 4.x) — same semantics as streaming/ratelimiter.py, expressed
with the newer StatefulProcessor interface (typed ValueState, explicit
lifecycle).

Runtime requirements (why this is the secondary implementation here):
- the RocksDB state store provider
  (spark.sql.streaming.stateStore.providerClass =
  ...state.RocksDBStateStoreProvider)
- the ``protobuf`` Python package (Spark serializes TWS state through
  it) — NOT available in this container, so the end-to-end test skips
  unless it is installed; streaming/ratelimiter.py
  (applyInPandasWithState) is the fully-tested primary path.

Both implementations share ``admit_fold`` so the admission math exists
in exactly one place.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor, StatefulProcessorHandle,
)
from pyspark.sql import types as T

from currency_market_pulse_spark.streaming.ratelimiter import (
    DEFAULT_LIMIT, DEFAULT_WINDOW_MS, OUTPUT_SCHEMA, admit_fold,
)


class RateLimiterProcessor(StatefulProcessor):
    def __init__(self, window_ms: int = DEFAULT_WINDOW_MS,
                 limit: int = DEFAULT_LIMIT):
        self.window_ms = window_ms
        self.limit = limit

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._recent = handle.getValueState(
            "recent_ms",
            T.StructType([T.StructField("ts", T.ArrayType(T.LongType()))]))

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        recent = list(self._recent.get()[0]) if self._recent.exists() else []
        batch = pd.concat(list(rows)).sort_values(["ts_ms", "event_id"])
        out = {"user_id": [], "event_id": [], "ts_ms": [],
               "n_in_window": [], "admitted": [], "retry_after_ms": []}
        for r in batch.itertuples():
            recent, n, ok, retry = admit_fold(
                recent, int(r.ts_ms), self.window_ms, self.limit)
            out["user_id"].append(key[0])
            out["event_id"].append(int(r.event_id))
            out["ts_ms"].append(int(r.ts_ms))
            out["n_in_window"].append(n)
            out["admitted"].append(ok)
            out["retry_after_ms"].append(retry)
        self._recent.update((recent,))
        yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def rate_limit_stream_tws(events: DataFrame,
                          window_ms: int = DEFAULT_WINDOW_MS,
                          limit: int = DEFAULT_LIMIT) -> DataFrame:
    """transformWithStateInPandas twin of rate_limit_stream."""
    return (events.groupBy("user_id")
            .transformWithStateInPandas(
                RateLimiterProcessor(window_ms, limit),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Append",
                timeMode="None"))
