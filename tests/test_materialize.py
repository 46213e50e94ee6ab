"""Result equality of the three `spark.currency_market_pulse.materialize`
modes (materialize.py): the conf picks a failure-domain/plan-shape
trade, never a result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from currency_market_pulse_spark.materialize import CONF_KEY, shared
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("mode", ["localCheckpoint", "persist", "none"])
def test_modes_equal_on_shared_sites(spark, mode):
    from currency_market_pulse_spark.queries.sessions import (
        user_conversion_funnel,
    )
    from currency_market_pulse_spark.queries.relational import (
        rate_nullsafe_join,
    )

    prev = spark.conf.get(CONF_KEY, None)
    spark.conf.set(CONF_KEY, mode)
    try:
        got_f = _rows(user_conversion_funnel(spark, SF_DIR))
        got_n = _rows(rate_nullsafe_join(spark, SF_DIR))
    finally:
        if prev is None:
            spark.conf.unset(CONF_KEY)
        else:
            spark.conf.set(CONF_KEY, prev)
    # pin against the default-mode result computed fresh
    base_f = _rows(user_conversion_funnel(spark, SF_DIR))
    base_n = _rows(rate_nullsafe_join(spark, SF_DIR))
    assert got_f == base_f
    assert got_n == base_n


def test_bad_mode_raises(spark):
    df = spark.range(3)
    spark.conf.set(CONF_KEY, "bogus")
    try:
        with pytest.raises(ValueError):
            shared(df)
    finally:
        spark.conf.unset(CONF_KEY)


def test_shared_preserves_rows(spark):
    df = spark.range(100).withColumn("k", F.col("id") % 7)
    agg = df.groupBy("k").agg(F.count("*").alias("n"))
    assert _rows(shared(agg)) == _rows(agg)
