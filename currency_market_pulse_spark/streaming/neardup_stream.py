"""Streaming near-duplicate detection: every micro-batch of documents
probes the standing MinHash band index for near-dups against the
already-ingested corpus, then appends its own bands + shingles to the
index — the streaming run-loop of the incremental dedup shape
(queries/dedup.py dedup_incremental documents the batch-vs-corpus
cost argument; this module is what executes it continuously).

The standing index is two parquet relations the stream maintains:

- bands:    (doc_id, band, band_sig, batch_id) — the LSH probe index;
            at 100 TB stored bucketed by band_sig so a probe reads
            only matching buckets.
- shingles: (doc_id, n_sh, sh, batch_id) — the verify relation; the
            exact-jaccard check is candidate-bounded
            (operators/dedup.py cross_jaccard_verify semi-join prune).

Idempotency contract (the importer's batch-id discipline,
streaming/importer.py): every write lands under batch_id=<id> with
dynamic partition overwrite, and a replayed batch EXCLUDES its own
prior writes from the probe — so crash-replay neither duplicates
index rows nor flags a document against its own previous ingest.

Within-batch near-dups are ALSO flagged (batch-internal band self-join
+ verify, lower doc_id wins), so a batch carrying two copies of a new
document does not ingest both silently — the dup log's best-match rank
runs over the union of batch-vs-corpus and batch-internal hits.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.utils import AnalysisException

from currency_market_pulse_spark.functions.text import tokens
from currency_market_pulse_spark.operators import dedup as D

# Explicit index schemas: the standing relations are read with these
# instead of inference, so a dataset whose only partitions so far are
# EMPTY (zero dups, or every doc shorter than the shingle width —
# dynamic-partition-overwrite then writes no parquet footers at all)
# still reads back as a valid empty relation instead of failing with
# "unable to infer schema".
_BANDS_SCHEMA = "doc_id bigint, band int, band_sig string, batch_id bigint"
_SHINGLES_SCHEMA = "doc_id bigint, n_sh bigint, sh string, batch_id bigint"
_DUPS_SCHEMA = ("new_id bigint, dup_of bigint, jaccard double, "
                "batch_id bigint")


@dataclass
class StreamingNearDup:
    """foreachBatch handler maintaining the incremental dedup index.

    Outputs per batch: ``dups_path`` gains one batch_id partition of
    (new_id, dup_of, jaccard) — each flagged document's best standing
    match at ``threshold`` — while ``bands_path`` / ``shingles_path``
    gain the batch's index contribution."""

    bands_path: str
    shingles_path: str
    dups_path: str
    threshold: float = 0.5

    def _read_index(self, spark, path: str, batch_id: int,
                    schema: str) -> DataFrame | None:
        try:
            df = spark.read.schema(schema).parquet(path)
        except AnalysisException:  # first batch: path does not exist yet
            return None
        # replay safety: never probe rows this batch wrote before a crash
        return df.filter(F.col("batch_id") != batch_id)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        toks = batch.select("doc_id", tokens(F.col("text")).alias("_t"))
        sh = D.shingles_from_tokens(toks).persist()
        try:
            bands = D.minhash_bands(D.minhash_signatures(
                None, shingles_df=sh))
            # batch-internal near-dups: lower doc_id wins, the higher
            # id is flagged as its dup (same first-owner convention as
            # the batch chunk/substring dedup operators)
            intra = (D.jaccard_verify_candidates(
                sh, D.pairs_from_bands(bands), threshold=self.threshold)
                .select(F.col("id_b").alias("new_id"),
                        F.col("id_a").alias("dup_of"), "jaccard"))
            hits = [intra]
            idx_bands = self._read_index(
                spark, self.bands_path, batch_id, _BANDS_SCHEMA)
            idx_sh = self._read_index(
                spark, self.shingles_path, batch_id, _SHINGLES_SCHEMA)
            if idx_bands is not None and idx_sh is not None:
                cand = D.cross_corpus_candidates(bands, idx_bands)
                hits.append(D.cross_jaccard_verify(
                    sh, idx_sh.select("doc_id", "n_sh", "sh"), cand,
                    threshold=self.threshold)
                    .select("new_id",
                            F.col("corpus_id").alias("dup_of"),
                            "jaccard"))
            union = hits[0] if len(hits) == 1 else hits[0].unionAll(hits[1])
            w = Window.partitionBy("new_id").orderBy(
                F.desc("jaccard"), "dup_of")
            dups = (union.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .select("new_id", "dup_of", "jaccard"))

            def _write(df: DataFrame, path: str) -> None:
                (df.withColumn("batch_id",
                               F.lit(batch_id).cast("bigint"))
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("batch_id")
                 .parquet(path))

            _write(dups, self.dups_path)
            _write(bands, self.bands_path)
            _write(sh, self.shingles_path)
        finally:
            sh.unpersist()

    def read_dups(self, spark) -> DataFrame:
        """Schema-safe read of the accumulated dup log — consumers use
        this (not bare spark.read.parquet) so an all-empty-partition
        dataset is an empty relation, not an inference error."""
        return spark.read.schema(_DUPS_SCHEMA).parquet(self.dups_path)

    def attach(self, stream_df: DataFrame, checkpoint_dir: str,
               trigger: str | None = None):
        """Wire onto a streaming DataFrame of (doc_id, text)."""
        writer = (stream_df.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("update"))
        if trigger:
            writer = writer.trigger(processingTime=trigger)
        return writer.start()
