"""Streaming heavy-hitter tracking over the count-min sketch: every
micro-batch folds its local token sketch into a standing sketch store
by cell-wise addition — the merge property operators/textops.py
cms_sketch is built around (and tests pin), executed continuously.

State shape: the standing store is one parquet relation
(row, bucket, cnt, batch_id), at most rows x width cells PER BATCH
partition; the merged sketch at read time is a single hash aggregate
over at most n_batches * rows * width tiny rows.  Candidate tokens for
heavy-hitter reporting are each batch's local top-M tokens (exact
batch-local counts are small state — M rows per batch); a token
globally heavy but never locally top-M in any batch is missed, the
standard space-saving trade, stated here rather than hidden (lowering
M or switching the candidate rule to a count threshold narrows it).

Idempotency contract (the importer/near-dup batch-id discipline):
every write lands under batch_id=<id> with dynamic partition
overwrite, so a crash-replayed batch REPLACES its prior contribution
instead of double-counting it — counts in the merged sketch stay
exactly-once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.utils import AnalysisException

from currency_market_pulse_spark.functions.text import tokens
from currency_market_pulse_spark.operators import textops as X

_SKETCH_SCHEMA = ("row int, bucket bigint, cnt bigint, "
                  "n_rows int, width int, batch_id bigint")
_CAND_SCHEMA = "tok string, batch_cnt bigint, batch_id bigint"


@dataclass
class StreamingHeavyHitters:
    """foreachBatch handler maintaining the standing CMS + candidates.

    The sketch geometry (``rows`` x ``width``) is fixed at handler
    construction and PERSISTED alongside every batch's cells: cell
    indices are only meaningful under the geometry that hashed them,
    so merging contributions of different geometries would silently
    mix incompatible buckets.  ``merged_sketch`` therefore refuses
    (ValueError) any standing store whose recorded geometry differs
    from the handler's — re-tuning the defaults requires a new store,
    never a silent mix."""

    sketch_path: str
    cand_path: str
    top_m: int = 64
    rows: int = X.CMS_ROWS
    width: int = X.CMS_WIDTH

    def process_batch(self, batch: DataFrame, batch_id: int,
                      toks: DataFrame | None = None) -> None:
        """``toks``: optional pre-tokenized (doc_id, _t) relation for
        ``batch`` (the fused doc pipeline's shared tokenization,
        streaming/pipeline.py) — the sketch cells and candidates then
        derive from ONE cached token relation instead of tokenizing
        the batch twice (cms_sketch + local counts).  Bit-equal
        either way: tokens() is deterministic, explode drops null
        arrays exactly as cms_sketch's isNotNull filter drops null
        texts, and the repartition inside cms_sketch is a
        parallelism detail with no row effect."""
        if toks is not None:
            occ = toks.select(F.explode("_t").alias("tok"))
            # cms_sketch's cell derivation over the shared occurrence
            # relation (operators/textops.py:580 for the semantics)
            rowed = occ.select(
                F.col("tok"),
                F.explode(F.sequence(F.lit(0), F.lit(self.rows - 1)))
                .alias("row"))
            bucket = X.cms_bucket(F.col("tok"), F.col("row"),
                                  self.width)
            delta = (rowed.select("row", bucket.alias("bucket"))
                     .groupBy("row", "bucket")
                     .agg(F.count(F.lit(1)).alias("cnt")))
        else:
            occ = (batch.filter(F.col("text").isNotNull())
                   .select(F.explode(tokens(F.col("text")))
                           .alias("tok")))
            delta = X.cms_sketch(batch, self.rows, self.width)
        delta = (delta
                 .withColumn("n_rows", F.lit(self.rows).cast("int"))
                 .withColumn("width", F.lit(self.width).cast("int")))
        local = (occ.groupBy("tok")
                 .agg(F.count(F.lit(1)).alias("batch_cnt")))
        # orderBy().limit() compiles to a distributed TakeOrdered —
        # an unpartitioned Window here would drag every distinct
        # token of the batch through ONE task (the sampling.py
        # single-partition-window rule)
        cand = (local.orderBy(F.desc("batch_cnt"), "tok")
                .limit(self.top_m))

        def _write(df: DataFrame, path: str) -> None:
            (df.withColumn("batch_id", F.lit(batch_id).cast("bigint"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id")
             .parquet(path))

        _write(delta, self.sketch_path)
        _write(cand, self.cand_path)

    def merged_sketch(self, spark) -> DataFrame:
        """Cell-wise fold of every batch's contribution — identical to
        the batch CMS over the union of all ingested documents."""
        try:
            raw = spark.read.schema(_SKETCH_SCHEMA).parquet(
                self.sketch_path)
        except AnalysisException:
            return spark.createDataFrame([], _SKETCH_SCHEMA) \
                .select("row", "bucket", "cnt")
        # Stores written before geometry recording (pre-r8) read back
        # with NULL n_rows/width under the explicit schema; every such
        # store was hashed at the then-only module defaults, so NULL
        # means (X.CMS_ROWS, X.CMS_WIDTH) — refusing it would brick
        # working stores with a confusing '(None, None)' (ADVICE r8).
        geoms = [((g["n_rows"] if g["n_rows"] is not None else X.CMS_ROWS),
                  (g["width"] if g["width"] is not None else X.CMS_WIDTH))
                 for g in raw.select("n_rows", "width").distinct()
                 .collect()]
        bad = sorted(set(g for g in geoms if g != (self.rows, self.width)))
        if bad:
            raise ValueError(
                f"standing sketch at {self.sketch_path} holds geometry "
                f"{bad} but this handler is {(self.rows, self.width)}; "
                f"cells from different geometries cannot be merged — "
                f"rebuild the store under the new geometry (NULL "
                f"recorded geometry counts as the pre-recording "
                f"defaults {(X.CMS_ROWS, X.CMS_WIDTH)})")
        return (raw.groupBy("row", "bucket")
                .agg(F.sum("cnt").alias("cnt")))

    def heavy_hitters(self, spark, k: int = 20) -> DataFrame:
        """Top-k candidate tokens by merged-sketch estimate (est always
        >= the token's true ingested count)."""
        try:
            cand = (spark.read.schema(_CAND_SCHEMA)
                    .parquet(self.cand_path)
                    .select("tok").distinct())
        except AnalysisException:
            return spark.createDataFrame([], "tok string, est bigint")
        sketch = self.merged_sketch(spark)
        probes = cand.select(
            "tok",
            F.explode(F.sequence(F.lit(0), F.lit(self.rows - 1)))
            .alias("row"))
        bucket = X.cms_bucket(F.col("tok"), F.col("row"), self.width)
        est = (probes.select("tok", F.col("row").cast("int").alias("row"),
                             bucket.alias("bucket"))
               .join(F.broadcast(sketch), ["row", "bucket"])
               .groupBy("tok").agg(F.min("cnt").alias("est")))
        return est.orderBy(F.desc("est"), "tok").limit(k)

    def attach(self, stream_df: DataFrame, checkpoint_dir: str,
               trigger: str | None = None):
        """Wire onto a streaming DataFrame carrying a ``text`` column."""
        writer = (stream_df.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("update"))
        if trigger:
            writer = writer.trigger(processingTime=trigger)
        return writer.start()
