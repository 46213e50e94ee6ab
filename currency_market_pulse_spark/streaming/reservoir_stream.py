"""Streaming reservoir sample: a fixed-size weighted random sample of
an UNBOUNDED document stream, kept exactly equal to what the batch
draw over everything-seen-so-far would return.

Classic reservoir algorithms (Vitter 1985 Algorithm R) are sequential
— each arrival flips a coin against a mutable counter — so they
neither parallelize nor replay.  The distributed form is the bottom-k
sketch over Efraimidis & Spirakis exponential keys (Efraimidis &
Spirakis 2006; Cohen & Kaplan 2007 bottom-k sketches): a row's key
-ln(u)/w depends ONLY on (seed, doc_id, weight) — operators/
sampling.py ``es_key``, the same definition the batch
``weighted_sample`` ranks by — and the reservoir after any prefix of
the stream is simply the k smallest keys seen.  Bottom-k is a
MERGEABLE sketch: union two reservoirs, keep the k smallest, and you
get exactly the reservoir of the union.  So each micro-batch does

    keyed(batch)  UNION  previous k-row snapshot  ->  bottom-k

— one scan of the batch (key it, no shuffle), a union with a
CONSTANT k-row relation, one TakeOrdered(k).  State never grows with
the corpus; at 100 TB/day ingest the standing store is still k rows.

Snapshots and replay: every batch writes the FULL (k-row) reservoir
under ``batch_id=<id>`` with dynamic partition overwrite (the
importer's idempotency discipline, streaming/importer.py).  A replayed
batch reads its PREDECESSOR snapshot (max batch_id strictly below its
own — its earlier crashed write is invisible to itself), recomputes
the identical deterministic bottom-k, and overwrites its own
partition byte-for-byte: crash-replay cannot duplicate, drop, or
reorder sample rows.  Keeping each batch's snapshot also gives
time-travel for free — ``read_reservoir(spark, at_batch=n)`` is the
exact sample as of batch n (each snapshot is k rows, so retention
costs k rows per batch; ``prune`` drops all but the newest few once a
run is accepted).

Duplicate ids across batches are FIRST-SEEN-WINS: a re-ingested
doc_id carries the same key — keys are id-coordinated PROVIDED the
id's weight is stable across arrivals (``es_key`` is a function of
(seed, id, weight), so a re-ingest under a CHANGED weight draws a
fresh key; the coordination guarantee assumes stable weights per id)
— so re-arrival never boosts a document's inclusion probability: the
sample is over DISTINCT ids, the property coordinated sampling
exists for.  Duplicate ids WITHIN one micro-batch are resolved by a
content-deterministic order (key, then a payload hash — ADVICE r9),
not arrival order, so crash-replay picks the same copy.  Rows with
weight <= 0 are excluded, as in the batch draw.

Reference parity note: the reference (anton-kapralov/
currency-market-pulse) has no sampling surface; this module belongs
to the LLM-training-data extension family, giving the ingest pipeline
(streaming/pipeline.py's shape) a constant-memory uniform/weighted
eval-set draw of everything ever ingested.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.utils import AnalysisException

from currency_market_pulse_spark.operators.sampling import es_key


@dataclass
class StreamingReservoir:
    """foreachBatch handler maintaining the bottom-k reservoir.

    ``weight_col=None`` draws uniformly (weight 1.0 for every row);
    otherwise weight-proportional without replacement, exactly
    ``operators/sampling.weighted_sample`` semantics.  ``payload``
    maps carried-through column names to their DDL types — the
    snapshot is read back with an explicit schema (the neardup_stream
    all-empty-partition lesson)."""

    reservoir_path: str
    k: int = 64
    id_col: str = "doc_id"
    weight_col: str | None = None
    seed: str = "ws"
    payload: tuple[tuple[str, str], ...] = (("text", "string"),)

    def _schema(self) -> str:
        cols = ", ".join(f"{n} {t}" for n, t in self.payload)
        base = f"{self.id_col} bigint, {cols}" if cols else \
            f"{self.id_col} bigint"
        return base + ", weight double, key double, batch_id bigint"

    def _keyed(self, batch: DataFrame) -> DataFrame:
        w = (F.col(self.weight_col).cast("double")
             if self.weight_col else F.lit(1.0))
        names = [n for n, _ in self.payload]
        return (batch.select(F.col(self.id_col), *names,
                             w.alias("weight"))
                .filter(F.col("weight") > 0)
                .withColumn("key", es_key(F.col(self.id_col),
                                          F.col("weight"), self.seed)))

    def _snapshot_before(self, spark: SparkSession,
                         batch_id: int) -> DataFrame | None:
        """The newest snapshot strictly below ``batch_id`` — a
        replayed batch never sees its own crashed write."""
        try:
            df = spark.read.schema(self._schema()).parquet(
                self.reservoir_path)
        except AnalysisException:  # first batch: no store yet
            return None
        prior = df.filter(F.col("batch_id") < batch_id)
        top = prior.agg(F.max("batch_id")).collect()[0][0]
        if top is None:
            return None
        return prior.filter(F.col("batch_id") == top).drop("batch_id")

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        names = [n for n, _ in self.payload]
        cols = [self.id_col, *names, "weight", "key"]
        # _src orders the first-seen-wins dedupe: the standing
        # snapshot (0) beats this batch's copy (1) deterministically
        pool = self._keyed(batch).select(*cols, F.lit(1).alias("_src"))
        prev = self._snapshot_before(spark, batch_id)
        if prev is not None:
            pool = prev.select(*cols, F.lit(0).alias("_src")) \
                .unionAll(pool)
        # _src alone leaves duplicate ids WITHIN one micro-batch
        # tie-broken by arrival order, which a crash-replay need not
        # reproduce (ADVICE r9) — extend the order with key and a
        # payload hash so the winning copy is a pure function of row
        # CONTENT, keeping replay byte-idempotent even for same-id
        # rows that differ in weight or payload.
        content_tiebreak = F.xxhash64(
            *[F.col(n) for n, _ in self.payload], F.col("weight"))
        first_seen = F.row_number().over(
            Window.partitionBy(self.id_col)
            .orderBy("_src", "key", content_tiebreak))
        merged = self._bottom_k(
            pool.withColumn("_rn", first_seen)
            .filter(F.col("_rn") == 1)).select(*cols)
        (merged.withColumn("batch_id", F.lit(batch_id).cast("bigint"))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(self.reservoir_path))

    def _bottom_k(self, pool: DataFrame) -> DataFrame:
        # bottom-k of a <= (k + |batch|)-row relation: ties break on
        # id, matching weighted_sample
        return pool.orderBy("key", self.id_col).limit(self.k)

    # -- reads ----------------------------------------------------------
    def read_reservoir(self, spark: SparkSession,
                       at_batch: int | None = None) -> DataFrame:
        """The reservoir as of ``at_batch`` (default: newest) —
        schema-safe (empty relation, not an inference error, when
        nothing has been ingested)."""
        try:
            df = spark.read.schema(self._schema()).parquet(
                self.reservoir_path)
        except AnalysisException:
            return spark.createDataFrame([], self._schema()) \
                .drop("batch_id")
        if at_batch is not None:
            df = df.filter(F.col("batch_id") <= at_batch)
        top = df.agg(F.max("batch_id")).collect()[0][0]
        if top is None:
            return spark.createDataFrame([], self._schema()) \
                .drop("batch_id")
        return df.filter(F.col("batch_id") == top).drop("batch_id")

    # -- retention ------------------------------------------------------
    def prune(self, keep_last: int = 2) -> list[str]:
        """Drop all but the newest ``keep_last`` snapshots (k rows
        each).  Like compaction, run only while the stream is STOPPED
        — a concurrent replay could need the predecessor snapshot."""
        if not os.path.isdir(self.reservoir_path):
            return []
        parts = sorted(
            (int(n.split("=", 1)[1]), n)
            for n in os.listdir(self.reservoir_path)
            if n.startswith("batch_id="))
        doomed = [n for _, n in parts[:-keep_last]] if keep_last else \
            [n for _, n in parts]
        for name in doomed:
            shutil.rmtree(os.path.join(self.reservoir_path, name),
                          ignore_errors=True)
        return doomed

    # -- wiring ---------------------------------------------------------
    def attach(self, stream_df: DataFrame, checkpoint_dir: str,
               trigger: str | None = None):
        """Wire onto a streaming DataFrame carrying (id_col, payload
        columns [, weight_col])."""
        writer = (stream_df.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("update"))
        if trigger:
            writer = writer.trigger(processingTime=trigger)
        return writer.start()


@dataclass
class StreamingGroupReservoir(StreamingReservoir):
    """Per-stratum reservoirs: k rows per ``group_col`` value instead
    of k overall — the streaming twin of ``operators/sampling.
    weighted_sample_per_group``, maintaining a per-language /
    per-source eval draw at ingest.

    Same key function (a row's key is independent of its stratum, so
    re-bucketing never changes draw priority — the batch operator's
    append-stability argument), same snapshot/replay machinery; only
    the bottom-k step ranks WITHIN each group.  Standing state is
    k x |groups| rows — bounded because the stratifier is a
    low-cardinality dimension (language, source, shard), NOT a
    data-sized key; a data-sized group column would grow the snapshot
    linearly and belongs in the base reservoir instead.  ``group_col``
    must be one of the ``payload`` columns (it rides the same
    carried-through projection)."""

    group_col: str = "lang"
    payload: tuple[tuple[str, str], ...] = (("text", "string"),
                                            ("lang", "string"))

    def __post_init__(self):
        if self.group_col not in {n for n, _ in self.payload}:
            raise ValueError(
                f"group_col {self.group_col!r} must be a payload column")

    def _bottom_k(self, pool: DataFrame) -> DataFrame:
        w = Window.partitionBy(self.group_col).orderBy(
            "key", self.id_col)
        return (pool.withColumn("_gr", F.row_number().over(w))
                .filter(F.col("_gr") <= self.k))
