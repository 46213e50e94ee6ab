"""Table profiling (ANALYZE-style column statistics) in ONE pass:
null counts, exact distinct counts, min/max per column, emitted as a
long-format relation — the stats a query planner, data-quality
monitor, or ingestion gate reads.

Single-scan design: every column's aggregates are computed in one
``agg`` over the table (count-distincts share the scan via Catalyst's
Expand), then the one result row is exploded into per-column rows with
a literal struct array — O(n_cols) plan size, ONE pass over the data,
no per-column re-scan.  At 100 TB per-column re-scans are the
difference between minutes and days.

Numeric and string columns keep typed min/max in separate fields
(min_num/max_num vs min_str/max_str) so the output schema is uniform
without lossy casts."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, numeric_cols: list[str],
                    string_cols: list[str],
                    approx_ndv: bool = False,
                    rsd: float = 0.01) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str) — one row per profiled column, one table scan
    total.

    ``approx_ndv``: exact ``countDistinct`` keeps a hash SET of every
    column's values in each task's partial-aggregation state — memory
    grows with per-column NDV, and a high-cardinality column (price,
    id) OOMs the executors at large SF (measured at sf1 under a 1g
    heap; at 100 TB it is structural, not a config issue).  True swaps
    in ``approx_count_distinct`` (HyperLogLog++): constant ~kB sketch
    per column per task at ``rsd`` relative error — the ANALYZE-grade
    trade every warehouse makes.  Exact stays the default so the
    differential gate can prove the rest of the math bitwise; the
    scale deployment should pass approx_ndv=True."""
    nd = ((lambda c: F.approx_count_distinct(c, rsd)) if approx_ndv
          else F.countDistinct)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in numeric_cols + string_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            nd(c).alias(f"_nd_{c}"),
            F.min(c).alias(f"_min_{c}"),
            F.max(c).alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)

    def _struct(c: str, numeric: bool):
        null_s = F.lit(None).cast("string")
        null_n = F.lit(None).cast("double")
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            (F.round(F.col(f"_min_{c}").cast("double"), 6)
             if numeric else null_n).alias("min_num"),
            (F.round(F.col(f"_max_{c}").cast("double"), 6)
             if numeric else null_n).alias("max_num"),
            (F.col(f"_min_{c}").cast("string")
             if not numeric else null_s).alias("min_str"),
            (F.col(f"_max_{c}").cast("string")
             if not numeric else null_s).alias("max_str"),
        )

    structs = ([_struct(c, True) for c in numeric_cols]
               + [_struct(c, False) for c in string_cols])
    return (row.select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*").orderBy("col_name"))
