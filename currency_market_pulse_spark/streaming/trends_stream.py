"""Streaming trends: the reference's analytical query as a live
materialized view.

The reference recomputes the window aggregation on every HTTP request
(trends/listing/service.go:47-62); the streaming engine can instead
maintain it incrementally.  The reference has NO late-data story
(SURVEY §2.4 T5: rows land with whatever time_placed they carry and a
batch query naturally includes them); a streaming view must bound its
state, so we add an explicit watermark — this is a documented semantic
delta: events later than the watermark are dropped from the live view
(they'd still appear in batch queries over the sink).

Median note: exact percentiles aren't incrementally maintainable in
append mode; the live view serves min/max/mean/count (associative
merges), and exact median stays on the batch path (operators/trends.py)
— the same split ClickHouse makes (its live mat-views hold aggregate
states; `median` there is approximate anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def trends_live(trades_stream: DataFrame,
                window_width: str = "10 minutes",
                watermark: str = "10 minutes",
                value_col: str = "rate",
                time_col: str = "time_placed") -> DataFrame:
    """Incrementally-maintained tumbling-window aggregates over a
    normalized trades stream, grouped per currency pair."""
    v = F.col(value_col)
    return (
        trades_stream
        .withWatermark(time_col, watermark)
        .groupBy(
            F.window(F.col(time_col), window_width),
            F.col("currency_from"), F.col("currency_to"))
        .agg(F.min(v).alias("min"),
             F.max(v).alias("max"),
             F.avg(v).alias("mean"),
             F.count(v).alias("n_trades"))
        .select(F.col("window").start.alias("time_window"),
                "currency_from", "currency_to",
                "min", "max", "mean", "n_trades")
    )
