"""transformWithStateInPandas limiter variant — end-to-end run gated
on the protobuf package (Spark serializes TWS state through it; not in
this container).  The shared admission math is fully covered by
tests/test_ratelimit_stream.py either way."""

from __future__ import annotations

import json
import time

import pytest


def test_processor_constructs():
    from currency_market_pulse_spark.streaming.ratelimiter_tws import (
        RateLimiterProcessor,
    )
    p = RateLimiterProcessor(window_ms=1000, limit=3)
    assert p.window_ms == 1000 and p.limit == 3


class _FakeValueState:
    """Duck-typed stand-in for the TWS ValueState handle."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def getValueState(self, name, schema):
        return _FakeValueState()


class _FakeGroupState:
    """Duck-typed stand-in for applyInPandasWithState's GroupState."""

    hasTimedOut = False

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def setTimeoutDuration(self, ms):
        pass

    def remove(self):
        self._v = None


def test_tws_and_primary_limiters_agree_batch_for_batch():
    """Cross-validation of the pair (VERDICT r3 item 6): the TWS
    StatefulProcessor and the applyInPandasWithState fold must emit
    IDENTICAL admission decisions over the same randomized multi-batch,
    multi-user event sequence — including the state carried between
    micro-batches, which is exactly where the two implementations'
    plumbing differs (typed ValueState tuple vs state.get tuple).  The
    container lacks protobuf so the TWS runtime itself cannot execute
    (see module docstring); this drives both folds directly with
    duck-typed state handles, which covers everything except Spark's
    own state (de)serialization."""
    import random

    import pandas as pd

    from currency_market_pulse_spark.streaming.ratelimiter import _make_fold
    from currency_market_pulse_spark.streaming.ratelimiter_tws import (
        RateLimiterProcessor,
    )

    window_ms, limit = 1_000, 3
    rng = random.Random(42)
    users = ["u1", "u2", "hot"]
    # 6 micro-batches of bursty traffic; "hot" exceeds the limit often
    batches = []
    eid = 0
    t = 1_000
    for _ in range(6):
        rows = []
        for _ in range(40):
            u = rng.choice(users + ["hot", "hot"])
            t += rng.choice([1, 5, 20, 150, 600])
            rows.append({"user_id": u, "event_id": eid, "ts_ms": t})
            eid += 1
        batches.append(pd.DataFrame(rows))

    fold = _make_fold(window_ms, limit)
    primary_state = {u: _FakeGroupState() for u in users + ["hot"]}
    proc = RateLimiterProcessor(window_ms=window_ms, limit=limit)
    tws_state = {}

    primary_out, tws_out = [], []
    for batch in batches:
        for u, g in batch.groupby("user_id", sort=True):
            primary_out.extend(
                pd.concat(list(fold((u,), iter([g]), primary_state[u])))
                .to_dict("records"))
            if u not in tws_state:
                proc._recent = _FakeValueState()
                proc.init(_FakeHandle())
                tws_state[u] = proc._recent
            proc._recent = tws_state[u]
            tws_out.extend(
                pd.concat(list(proc.handleInputRows((u,), iter([g]), None)))
                .to_dict("records"))

    def canon(rows):
        # retry_after_ms is NaN for admitted rows (pandas null) — map to
        # None so equality is well-defined
        return sorted(
            ({**r, "retry_after_ms": None
              if pd.isna(r["retry_after_ms"]) else int(r["retry_after_ms"])}
             for r in rows),
            key=lambda r: (r["user_id"], r["event_id"]))

    assert canon(primary_out) == canon(tws_out)
    assert len(primary_out) == sum(len(b) for b in batches)
    # the sequence actually exercised rejection + retry hints
    rejected = [r for r in primary_out if not r["admitted"]]
    assert rejected and all(r["retry_after_ms"] > 0 for r in rejected)


def test_tws_stream_end_to_end(spark, tmp_path):
    pytest.importorskip("google.protobuf")
    from currency_market_pulse_spark.streaming.ratelimiter_tws import (
        rate_limit_stream_tws,
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "f1.json", "w") as f:
        for i in range(5):
            f.write(json.dumps(
                {"user_id": "hot", "event_id": i, "ts_ms": 1000 + i * 10}) + "\n")
    stream = (spark.readStream
              .schema("user_id string, event_id long, ts_ms long")
              .json(str(src)))
    q = (rate_limit_stream_tws(stream, window_ms=1000, limit=3)
         .writeStream.format("memory").queryName("tws_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("tws_out").count() < 5:
            time.sleep(0.5)
        rows = {r.event_id: r.admitted for r in spark.table("tws_out").collect()}
    finally:
        q.stop()
    assert [rows[i] for i in range(5)] == [True] * 3 + [False] * 2
