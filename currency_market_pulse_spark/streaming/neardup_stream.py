"""Streaming near-duplicate detection: every micro-batch of documents
probes the standing MinHash band index for near-dups against the
already-ingested corpus, then appends its own bands + shingles to the
index — the streaming run-loop of the incremental dedup shape
(queries/dedup.py dedup_incremental documents the batch-vs-corpus
cost argument; this module is what executes it continuously).

Standing-index layout (VERDICT r10 directive 1 — the pre-r11 version
re-read the ENTIRE flat index every micro-batch, measured as the
composed pipeline's saturation point at p95 11.5x the trigger budget):
each of the THREE relations — bands, shingles, and the exact-hash
relation (doc_id, md5(text)) that powers the exact fast path — is a
two-tier LSM-style store under its root —

- ``tail/batch_id=<id>/``   one coalesced file per micro-batch: the
  recent, not-yet-compacted appends.  Bounded: at most
  ``compact_every`` batch dirs ever accumulate.
- ``base/segment=<n>/<bucket>=<b>/``  immutable compacted segments,
  hash-bucketed by the PROBE KEY — ``sig_bucket =
  pmod(xxhash64(band, band_sig), n_buckets)`` for bands,
  ``id_bucket = pmod(doc_id, n_buckets)`` for shingles,
  ``h_bucket`` (first 8 hex chars of the md5, so the probe can
  derive it driver-side) for hashes — and sorted by it within each
  file.

Probe order is the production ingest-dedup order: EXACT first (md5 of
the full text against the standing hash relation — no shingling, no
minhash, no verify; jaccard is 1.0 by construction), then the minhash
band probe over only the exact-novel remainder.  Exact copies are NOT
appended to the index: exact equality is transitive, so a future copy
still matches the first-ingested document's hash — the standing index
grows with NOVEL content, not with ingest volume.  (One documented
consequence: a document with an exact standing match is reported
against its hash-equal match even if some other standing document
ties at jaccard 1.0 with a different shingle SET — both are correct
best matches at the threshold.)

The probe then reads ``base`` with a partition filter on the batch's
touched buckets (plan shows ``PartitionFilters: [sig_bucket IN
(...)]`` — only matching directories are scanned) plus the bounded
tail, and the batch side of the candidate join is broadcast so the
standing relation never shuffles.  The verify leg is pruned harder
still: it runs ONLY when the band probe produced candidates, reads
only the id buckets those candidates live in, and (when the candidate
set is small enough to collect) pushes a ``doc_id IN (...)`` filter
into the scan.  Per-batch cost is thus bounded by file-count-bounded
overhead plus bytes in MATCHING buckets — not by total index size
(tools/stream_bench.py's pre-seeded scenario measures exactly this
axis).

Compaction (every ``compact_every`` batches, inside process_batch so
it needs no side scheduler) folds committed tail dirs into a NEW base
segment — segments are immutable, so a minor compaction costs
O(tail), not O(index).  When the segment count would exceed
``max_segments`` the compaction merges all existing segments too
(major compaction, O(index) but amortized over
``max_segments * compact_every`` batches; a production deployment at
100 TB would replace merge-all with size-tiered levels — same
protocol, more tiers).  Crash-safety is the manifest protocol of
streaming/compaction.py adapted to append-only segments: write the
new segment to a hidden tmp dir, durably record intent (atomic-rename
manifest listing the consumed dirs), rename tmp into place, THEN
delete the consumed dirs.  ``_recover`` runs at the top of every
batch: manifest+tmp => the swap never happened, drop both (every row
still lives in its consumed dir); manifest+segment => finish the
deletes.  At no point does a reader see a row in zero or two places.

Replay interplay: only batch ids STRICTLY BELOW the current one are
ever compacted — Structured Streaming can only replay the newest
batch (delivering batch N commits N-1), so a compacted dir can never
be re-written; a crash-replayed compacting batch finds its segment
already present and skips.

Idempotency contract (the importer's batch-id discipline,
streaming/importer.py): every tail write lands under batch_id=<id>
with dynamic partition overwrite, and a replayed batch EXCLUDES its
own prior writes from the probe — so crash-replay neither duplicates
index rows nor flags a document against its own previous ingest.

Within-batch near-dups are ALSO flagged (batch-internal band self-join
+ verify, lower doc_id wins), so a batch carrying two copies of a new
document does not ingest both silently — the dup log's best-match rank
runs over the union of batch-vs-corpus and batch-internal hits.
"""

from __future__ import annotations

import json
import os
import shutil
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
_BANDS_DATA = "doc_id bigint, band int, band_sig string"
_SHINGLES_DATA = "doc_id bigint, n_sh bigint, sh string"
_HASHES_DATA = "doc_id bigint, h string"
_DUPS_SCHEMA = ("new_id bigint, dup_of bigint, jaccard double, "
                "batch_id bigint")

#: candidate sets larger than this are not collected to the driver —
#: the verify read then falls back to bucket pruning + the semi-join
#: prune alone (still exact, just no pushed doc_id IN filter).
_CAND_COLLECT_CAP = 100_000

_MANIFEST = "_compaction_manifest"
_TMPSEG = "_compacting_segment"


def _sig_bucket(n: int) -> "F.Column":
    return F.pmod(F.xxhash64("band", "band_sig"), F.lit(n)).cast("int")


def _id_bucket(n: int) -> "F.Column":
    return F.pmod(F.col("doc_id"), F.lit(n)).cast("int")


def _h_bucket(n: int) -> "F.Column":
    """Bucket of an md5 hex string — the first 8 hex chars as an int,
    chosen because the probe must derive the SAME bucket driver-side
    from collected hash values (``_h_bucket_py``)."""
    return F.pmod(F.conv(F.substring(F.col("h"), 1, 8), 16, 10)
                  .cast("long"), F.lit(n)).cast("int")


def _h_bucket_py(h: str, n: int) -> int:
    return int(h[:8], 16) % n


def _tail_dirs(root: str) -> list[tuple[int, str]]:
    tail = os.path.join(root, "tail")
    if not os.path.isdir(tail):
        return []
    out = []
    for d in os.listdir(tail):
        if d.startswith("batch_id="):
            out.append((int(d.split("=", 1)[1]), os.path.join(tail, d)))
    return sorted(out)


def _segment_dirs(root: str) -> list[tuple[int, str]]:
    base = os.path.join(root, "base")
    if not os.path.isdir(base):
        return []
    out = []
    for d in os.listdir(base):
        if d.startswith("segment="):
            out.append((int(d.split("=", 1)[1]), os.path.join(base, d)))
    return sorted(out)


def _recover(root: str) -> None:
    """Roll an interrupted compaction forward or back (module
    docstring protocol).  Cheap (os.path checks) — runs every batch."""
    manifest = os.path.join(root, _MANIFEST)
    tmp = os.path.join(root, _TMPSEG)
    if not os.path.exists(manifest):
        shutil.rmtree(tmp, ignore_errors=True)  # pre-manifest garbage
        return
    with open(manifest) as f:
        intent = json.load(f)
    seg_dir = os.path.join(root, "base", f"segment={intent['segment']}")
    if os.path.isdir(tmp):
        # crashed before the swap: the new segment never went live and
        # every row still lives in its consumed dir.
        shutil.rmtree(tmp, ignore_errors=True)
        os.remove(manifest)
        return
    if os.path.isdir(seg_dir):
        # swap happened: finish deleting the consumed sources.
        for rel in intent["consumed"]:
            shutil.rmtree(os.path.join(root, rel), ignore_errors=True)
    os.remove(manifest)


@dataclass
class StreamingNearDup:
    """foreachBatch handler maintaining the incremental dedup index.

    Outputs per batch: ``dups_path`` gains one batch_id partition of
    (new_id, dup_of, jaccard) — each flagged document's best standing
    match at ``threshold`` — while ``bands_path`` / ``shingles_path``
    gain the batch's index contribution (tail tier; see the module
    docstring for the two-tier layout and compaction)."""

    bands_path: str
    shingles_path: str
    dups_path: str
    threshold: float = 0.5
    n_buckets: int = 8
    compact_every: int = 32
    max_segments: int = 8
    #: standing (doc_id, md5(text)) relation for the exact fast path;
    #: defaults to a sibling of bands_path
    hashes_path: str | None = None

    def __post_init__(self):
        if self.hashes_path is None:
            self.hashes_path = self.bands_path + "_hashes"

    # ---- standing-index reads -------------------------------------

    def _read_tail(self, spark, root: str, data_schema: str,
                   exclude_batch: int | None = None) -> DataFrame | None:
        try:
            df = spark.read.schema(data_schema + ", batch_id bigint") \
                .parquet(os.path.join(root, "tail"))
        except AnalysisException:
            return None
        if exclude_batch is not None:
            # replay safety: never probe rows this batch wrote before
            # a crash (partition filter — pruned, not scanned+dropped)
            df = df.filter(F.col("batch_id") != exclude_batch)
        return df.drop("batch_id")

    def _read_base(self, spark, root: str, data_schema: str,
                   bucket_col: str,
                   buckets: list[int] | None = None) -> DataFrame | None:
        try:
            df = spark.read.schema(
                f"{data_schema}, segment bigint, {bucket_col} int") \
                .parquet(os.path.join(root, "base"))
        except AnalysisException:
            return None
        if buckets is not None:
            df = df.filter(F.col(bucket_col).isin(buckets))
        return df.drop("segment", bucket_col)

    def _read_index(self, spark, root: str, data_schema: str,
                    bucket_col: str, batch_id: int,
                    buckets: list[int] | None = None) -> DataFrame | None:
        parts = [p for p in (
            self._read_base(spark, root, data_schema, bucket_col, buckets),
            self._read_tail(spark, root, data_schema, batch_id),
        ) if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else parts[0].unionAll(parts[1])

    def read_bands(self, spark) -> DataFrame:
        """The full standing band index (base + tail), data cols only."""
        df = self._read_index(spark, self.bands_path, _BANDS_DATA,
                              "sig_bucket", batch_id=-1)
        return df if df is not None else \
            spark.createDataFrame([], _BANDS_DATA)

    def read_shingles(self, spark) -> DataFrame:
        """The full standing shingle relation (base + tail)."""
        df = self._read_index(spark, self.shingles_path, _SHINGLES_DATA,
                              "id_bucket", batch_id=-1)
        return df if df is not None else \
            spark.createDataFrame([], _SHINGLES_DATA)

    def read_hashes(self, spark) -> DataFrame:
        """The full standing exact-hash relation (base + tail)."""
        df = self._read_index(spark, self.hashes_path, _HASHES_DATA,
                              "h_bucket", batch_id=-1)
        return df if df is not None else \
            spark.createDataFrame([], _HASHES_DATA)

    # ---- compaction ------------------------------------------------

    def _compact_root(self, spark, root: str, data_schema: str,
                      bucket_expr: "F.Column", bucket_col: str,
                      sort_cols: list[str], upto_batch_id: int,
                      segment_id: int) -> bool:
        """Fold tail dirs with id < upto_batch_id (plus, on major
        compactions, every existing segment) into base/segment=<id>.
        Crash-safe per the module-docstring protocol.  Returns whether
        a segment was written."""
        _recover(root)
        seg_dir = os.path.join(root, "base", f"segment={segment_id}")
        if os.path.isdir(seg_dir):
            return False  # crash-replayed compacting batch: done already
        tails = [(i, p) for i, p in _tail_dirs(root) if i < upto_batch_id]
        if not tails:
            return False
        segs = _segment_dirs(root)
        consumed = [os.path.join("tail", os.path.basename(p))
                    for _, p in tails]
        srcs = [spark.read.schema(data_schema).parquet(p)
                for _, p in tails]
        if len(segs) + 1 > self.max_segments:  # major: merge-all
            consumed += [os.path.join("base", os.path.basename(p))
                         for _, p in segs]
            srcs += [spark.read.schema(f"{data_schema}, {bucket_col} int")
                     .parquet(p).drop(bucket_col) for _, p in segs]
        df = srcs[0]
        for s in srcs[1:]:
            df = df.unionAll(s)
        tmp = os.path.join(root, _TMPSEG)
        shutil.rmtree(tmp, ignore_errors=True)
        (df.withColumn(bucket_col, bucket_expr)
         .repartition(self.n_buckets, bucket_col)
         .sortWithinPartitions(*sort_cols)
         .write.mode("overwrite").partitionBy(bucket_col).parquet(tmp))
        manifest = os.path.join(root, _MANIFEST)
        with open(manifest + ".tmp", "w") as f:
            json.dump({"segment": segment_id, "consumed": consumed}, f)
        os.replace(manifest + ".tmp", manifest)
        os.makedirs(os.path.join(root, "base"), exist_ok=True)
        os.rename(tmp, seg_dir)
        for rel in consumed:
            shutil.rmtree(os.path.join(root, rel), ignore_errors=True)
        os.remove(manifest)
        return True

    def compact(self, spark, upto_batch_id: int,
                segment_id: int | None = None) -> None:
        """Compact both index relations' tails (ids < upto_batch_id)
        into a base segment.  Also the bulk-seed path: after feeding a
        corpus through ``process_batch``/``seed_index``, call this to
        fold everything into pruned, sorted base segments."""
        seg = upto_batch_id if segment_id is None else segment_id
        self._compact_root(spark, self.bands_path, _BANDS_DATA,
                           _sig_bucket(self.n_buckets), "sig_bucket",
                           ["band", "band_sig"], upto_batch_id, seg)
        self._compact_root(spark, self.shingles_path, _SHINGLES_DATA,
                           _id_bucket(self.n_buckets), "id_bucket",
                           ["doc_id"], upto_batch_id, seg)
        self._compact_root(spark, self.hashes_path, _HASHES_DATA,
                           _h_bucket(self.n_buckets), "h_bucket",
                           ["h"], upto_batch_id, seg)

    def seed_index(self, docs: DataFrame, segment_id: int = 0) -> None:
        """Bulk-load a corpus as base segment ``segment_id`` without
        probing (bench/bootstrap path: tools/stream_bench.py pre-seeds
        a 10x standing index with this to measure the probe's
        index-size axis).  Uses the exact same layout the compactor
        writes, so the streaming probe is oblivious to how the base
        was built."""
        toks = docs.select("doc_id", tokens(F.col("text")).alias("_t"))
        sh = D.shingles_from_tokens(toks).persist()
        try:
            bands = D.minhash_bands(D.minhash_signatures(
                None, shingles_df=sh))

            def _write(df, root, bucket_expr, bucket_col, sort_cols):
                tmp = os.path.join(root, _TMPSEG)
                shutil.rmtree(tmp, ignore_errors=True)
                (df.withColumn(bucket_col, bucket_expr)
                 .repartition(self.n_buckets, bucket_col)
                 .sortWithinPartitions(*sort_cols)
                 .write.mode("overwrite").partitionBy(bucket_col)
                 .parquet(tmp))
                os.makedirs(os.path.join(root, "base"), exist_ok=True)
                os.rename(tmp, os.path.join(
                    root, "base", f"segment={segment_id}"))

            _write(bands, self.bands_path, _sig_bucket(self.n_buckets),
                   "sig_bucket", ["band", "band_sig"])
            _write(sh, self.shingles_path, _id_bucket(self.n_buckets),
                   "id_bucket", ["doc_id"])
            _write(docs.select("doc_id", F.md5("text").alias("h")),
                   self.hashes_path, _h_bucket(self.n_buckets),
                   "h_bucket", ["h"])
        finally:
            sh.unpersist()

    # ---- the per-batch probe ----------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        for root in (self.bands_path, self.shingles_path,
                     self.hashes_path):
            _recover(root)
        if (self.compact_every and batch_id > 0
                and batch_id % self.compact_every == 0):
            self.compact(spark, upto_batch_id=batch_id)

        # ---- stage 1: the exact fast path (md5 of the full text).
        # Production ingest dedups exact copies BEFORE near-dup
        # machinery: an exact hit needs no shingling, no minhash, no
        # jaccard verify — and an exact copy adds nothing to the
        # standing index (exact equality is transitive, so future
        # copies still match the FIRST-INGESTED doc's hash).  In the
        # steady dup-heavy state the whole minhash branch is skipped.
        # The per-batch hash relation is batch-sized by construction,
        # so the dedup BOOKKEEPING runs driver-side on two bounded
        # collects (batch hashes; matching standing rows) — but every
        # relation that is WRITTEN derives from ``batch`` or the
        # standing parquet (JVM sources), never from a Python-local
        # DataFrame: a LocalRelation scan runs as Scan ExistingRDD
        # through per-job Python workers, and coalesce(1) over it
        # evaluates all parent partitions SERIALLY — measured at
        # seconds per write.
        # one materialization of the micro-batch: every downstream
        # relation (exact hits, remainder shingles, index tails) reads
        # the cache instead of re-scanning the source per write
        batch = batch.persist()
        try:
            self._probe_batch(spark, batch, batch_id)
        finally:
            batch.unpersist()

    def _probe_batch(self, spark, batch: DataFrame,
                     batch_id: int) -> None:
        pairs = batch.select("doc_id", F.md5("text").alias("h")) \
            .collect()
        if not pairs:
            return
        owner: dict[str, int] = {}
        for r in sorted(pairs):
            owner.setdefault(r.h, r.doc_id)
        idx_h = self._read_index(
            spark, self.hashes_path, _HASHES_DATA, "h_bucket",
            batch_id,
            buckets=sorted({_h_bucket_py(h, self.n_buckets)
                            for h in owner}))
        std = None
        matched: dict[str, int] = {}
        if idx_h is not None:
            std = idx_h.filter(F.col("h").isin(list(owner)))
            for r in sorted(std.collect(), key=lambda r: r.doc_id):
                matched.setdefault(r.h, r.doc_id)

        hashed = batch.select("doc_id", F.md5("text").alias("_h"))
        hits = []
        # within-batch exact copies (usually none): first owner keeps
        # the id; the owner lookup is a SMALL literal map over only
        # the hashes that actually repeat in this batch
        from collections import Counter
        h_counts = Counter(r.h for r in pairs)
        dup_hashes = {h: i for h, i in owner.items() if h_counts[h] > 1}
        if dup_hashes:
            m = F.map_from_arrays(
                F.array(*[F.lit(h) for h in dup_hashes]),
                F.array(*[F.lit(i).cast("bigint")
                          for i in dup_hashes.values()]))
            hits.append(
                hashed.withColumn("_own", m[F.col("_h")])
                .filter(F.col("_own").isNotNull()
                        & (F.col("doc_id") != F.col("_own")))
                .select(F.col("doc_id").alias("new_id"),
                        F.col("_own").alias("dup_of"),
                        F.lit(1.0).alias("jaccard")))
        if matched:
            # standing exact matches: a broadcast join against the
            # (JVM, parquet-backed) pruned standing rows — NOT a
            # literal map, whose hundreds of codegen'd literals were
            # measured as per-batch plan-compile overhead
            hits.append(
                hashed.join(
                    F.broadcast(std.withColumnRenamed(
                        "doc_id", "corpus_id")),
                    F.col("_h") == F.col("h"))
                .select(F.col("doc_id").alias("new_id"),
                        F.col("corpus_id").alias("dup_of"),
                        F.lit(1.0).alias("jaccard")))
        if not hits:
            hits = [spark.range(0).select(
                F.col("id").alias("new_id"),
                F.col("id").alias("dup_of"),
                F.lit(1.0).alias("jaccard"))]

        # ---- stage 2: the minhash near-dup branch, over the
        # exact-novel remainder only (first-owners with no standing
        # exact match); only the remainder joins the standing index
        # and only the remainder is appended to it.
        rem_ids = [i for h, i in owner.items() if h not in matched]
        if rem_ids:
            rem_docs = batch.filter(F.col("doc_id").isin(rem_ids))
            self._near_dup_stage(
                spark, rem_docs, batch_id, hits,
                hashes=rem_docs.select(
                    "doc_id", F.md5("text").alias("h")))
        else:
            self._rank_and_write(dups_only=True, hits=hits,
                                 batch_id=batch_id)

    def _near_dup_stage(self, spark, rem_docs: DataFrame,
                        batch_id: int, hits: list,
                        hashes: DataFrame) -> None:
        """The pre-fast-path probe, over the exact-novel remainder:
        shingle -> minhash bands -> bucket-pruned standing probe ->
        candidate-bounded exact-jaccard verify; then the remainder's
        index contribution is appended (tail tier)."""
        toks = rem_docs.select("doc_id", tokens(F.col("text"))
                               .alias("_t"))
        # explicit 8-way hash repartition on the aggregation key: a
        # micro-batch's shingle relation is ~1 MB, so AQE coalesces the
        # groupBy exchange to ONE task — serializing the CPU-heavy
        # minhash (12 seeded hashes per shingle).  A user repartition
        # is exempt from AQE coalescing, and the downstream
        # groupBy(doc_id) reuses its partitioning (no second exchange).
        sh = (D.shingles_from_tokens(toks)
              .repartition(8, "doc_id").persist())
        bands = D.minhash_bands(D.minhash_signatures(
            None, shingles_df=sh)).persist()
        cand = None
        try:
            # batch-internal near-dups: lower doc_id wins, the higher
            # id is flagged as its dup (same first-owner convention as
            # the batch chunk/substring dedup operators)
            hits.append(D.jaccard_verify_candidates(
                sh, D.pairs_from_bands(bands), threshold=self.threshold)
                .select(F.col("id_b").alias("new_id"),
                        F.col("id_a").alias("dup_of"), "jaccard"))
            # bucket-pruned probe: only base dirs holding one of the
            # batch's band-signature buckets are scanned (bounded
            # collect — at most n_buckets ints)
            touched = [r[0] for r in bands.select(
                _sig_bucket(self.n_buckets).alias("b")).distinct()
                .collect()]
            idx_bands = self._read_index(
                spark, self.bands_path, _BANDS_DATA, "sig_bucket",
                batch_id, buckets=touched) if touched else None
            if idx_bands is not None:
                # broadcast the batch side: the standing relation
                # streams through the join without shuffling
                cand = D.cross_corpus_candidates(
                    F.broadcast(bands), idx_bands).persist()
                cand_ids = [r[0] for r in cand.select("corpus_id")
                            .distinct().limit(_CAND_COLLECT_CAP + 1)
                            .collect()]
                if cand_ids:
                    hits.append(self._verify_cross(
                        spark, sh, cand, cand_ids, batch_id))
            self._rank_and_write(
                dups_only=False, hits=hits, batch_id=batch_id,
                bands=bands, sh=sh, hashes=hashes)
        finally:
            sh.unpersist()
            bands.unpersist()
            if cand is not None:
                cand.unpersist()

    def _rank_and_write(self, dups_only: bool, hits: list,
                        batch_id: int, bands: DataFrame | None = None,
                        sh: DataFrame | None = None,
                        hashes: DataFrame | None = None) -> None:
        union = hits[0]
        for h in hits[1:]:
            union = union.unionAll(h)
        w = Window.partitionBy("new_id").orderBy(
            F.desc("jaccard"), "dup_of")
        dups = (union.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("new_id", "dup_of", "jaccard"))

        def _write(df: DataFrame, path: str) -> None:
            # coalesce(1): a micro-batch's contribution is one
            # small file, not one per shuffle partition — the tail
            # stays O(compact_every) files, not O(32x that)
            (df.withColumn("batch_id",
                           F.lit(batch_id).cast("bigint"))
             .coalesce(1)
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id")
             .parquet(path))

        if dups_only:
            _write(dups, self.dups_path)
            return
        # the index-tail writes only dump the already-materialized
        # caches — overlap them with the dup computation+write on
        # worker threads (each inherits this query's FAIR pool via
        # Spark's inheritable local props)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [
                pool.submit(_write, bands,
                            os.path.join(self.bands_path, "tail")),
                pool.submit(_write, sh,
                            os.path.join(self.shingles_path, "tail")),
                pool.submit(_write, hashes,
                            os.path.join(self.hashes_path, "tail")),
            ]
            _write(dups, self.dups_path)
            for f in futs:
                f.result()

    def _verify_cross(self, spark, sh: DataFrame, cand: DataFrame,
                      cand_ids: list[int], batch_id: int) -> DataFrame:
        """Exact-jaccard verify of batch-vs-corpus candidates, reading
        only the shingle buckets the candidates live in (plus a pushed
        doc_id IN filter when the candidate set was small enough to
        collect in full)."""
        capped = len(cand_ids) <= _CAND_COLLECT_CAP
        buckets = (sorted({i % self.n_buckets for i in cand_ids})
                   if capped else None)
        idx_sh = self._read_index(
            spark, self.shingles_path, _SHINGLES_DATA, "id_bucket",
            batch_id, buckets=buckets)
        if capped:
            idx_sh = idx_sh.filter(F.col("doc_id").isin(cand_ids))
        return (D.cross_jaccard_verify(
            sh, idx_sh.select("doc_id", "n_sh", "sh"), cand,
            threshold=self.threshold)
            .select("new_id", F.col("corpus_id").alias("dup_of"),
                    "jaccard"))

    # ---- outputs / wiring -------------------------------------------

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
