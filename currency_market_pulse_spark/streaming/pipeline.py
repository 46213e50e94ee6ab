"""The composed streaming pipeline: every streaming piece of the
engine wired end to end, the way the reference's services compose in
production (consumer -> Kafka -> importer -> store -> trends API,
compose.yml) —

    raw trade requests (file-source twin of the Kafka front door)
      -> rate-limit GATEWAY (stateful sliding window per user,
         payload carried through; rejects get retry_after)
      -> parse + normalize admitted payloads (P1..P6 chain)
      -> ParquetTradesSink (date-partitioned, batch-id idempotent)
      -> LIVE trends view (manifest-log stream OVER THE SINK's txn
         commit log -> watermarked window aggregation -> in-memory
         queryable table; sources/txn_log_source.py — O(new batches)
         per trigger, no directory listing anywhere)
    + document stream -> streaming near-dup index probe (bands +
      shingles standing index, batch-id idempotent) + count-min heavy
      hitters + optional decontaminate-at-ingest screen + uniform
      reservoir sample of everything ingested (constant k-row state,
      reservoir_stream.py)

Up to six concurrent streaming queries (two chained through storage,
four document-side probes); the trends view consumes the SINK's
files, not the source — so the composition exercises the storage
hand-off exactly as the reference's trends service reads what the
importer wrote.  Rejected requests land in a dead-letter parquet with
their retry_after_ms, mirroring the consumer's HTTP 429 path
(ratelimit.go:38-62 via rest/api.go).

Delivery semantics: the import sink defaults to the WRITE-ONCE
transactional sink (streaming/txn_sink.py — manifest-committed
publication, every visible file immutable and added exactly once), so
BOTH the storage AND the live view's file stream are exactly-once
under crash-replay of the import query (closing VERDICT r7
directive 3; tests/test_txn_sink.py covers the full crash matrix —
crash before the manifest commit, mid-publish with divergent replayed
data, post-publish no-op — and proves a readStream.parquet live view
running THROUGH an injected mid-publish crash-replay of the import
query ends bit-for-bit equal to the batch result).  The
pre-r8 gap, kept here for the record: with the plain overwrite sink
(``txn_sink=False``) a replayed batch rewrites its partition with NEW
file names, which a path-keyed file source treats as fresh input —
storage stays exactly-once but the live view double-counts.  That
mode remains for layout-compatibility comparisons only.

At 100 TB nothing here changes shape: the gateway partitions by
user_id (state ~ in-window requests per user), the sink's dynamic
partition overwrite keeps replay exactly-once, the live view's state
is bounded by the watermark, and the near-dup probe runs at
batch x index cost (queries/dedup.py dedup_incremental).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from currency_market_pulse_spark.functions.normalize import (
    INGEST_SCHEMA, normalize_trades, parse_ingest_json, parse_time_placed,
)
from currency_market_pulse_spark.streaming.cms_stream import (
    StreamingHeavyHitters,
)
from currency_market_pulse_spark.streaming.decontam_stream import (
    StreamingDecontam,
)
from currency_market_pulse_spark.streaming.importer import ParquetTradesSink
from currency_market_pulse_spark.streaming.txn_sink import (
    TxnParquetTradesSink,
)
from currency_market_pulse_spark.streaming.reservoir_stream import (
    StreamingReservoir,
)
from currency_market_pulse_spark.streaming.neardup_stream import (
    StreamingNearDup,
)
from currency_market_pulse_spark.streaming.ratelimiter import (
    DEFAULT_LIMIT, DEFAULT_WINDOW_MS, rate_limit_gateway,
    rate_limit_gateway_bucketed,
)
from currency_market_pulse_spark.streaming.trends_stream import trends_live

#: how many per-trigger fused-doc timing dicts ComposedPipeline.doc_leg_s
#: retains (newest wins) — bounds driver memory on long-lived pipelines
DOC_LEG_RETAIN = 1000

#: sink-side schema for the live-view file stream (TRADES_SCHEMA plus
#: the sink's partition columns, explicit so an empty first batch
#: cannot break inference — the neardup_stream lesson).
_SINK_STREAM_SCHEMA = (
    "user_id string, currency_from string, currency_to string, "
    "amount_sell_micros long, amount_buy_micros long, rate double, "
    "originating_country string, time_placed timestamp, "
    "trade_date date, batch_id long")

_DEAD_LETTER_SCHEMA = (
    "user_id string, event_id long, ts_ms long, n_in_window int, "
    "retry_after_ms long, batch_id long")


@dataclass
class ComposedPipeline:
    """Handles for the running composition.

    NOTE on waiting: ``processAllAvailable`` is NOT usable here — the
    gateway's processing-time state timeout keeps the engine
    scheduling timeout-evaluation micro-batches, so the query never
    reports the idle point PAA waits for (measured: 100+ empty epochs
    and a blocked caller; the repo's rate-limiter tests poll for the
    same reason).  Use ``wait_for`` (poll until output targets) or
    ``wait_quiescent`` (poll until all outputs stop changing)."""

    spark: SparkSession
    trades_path: str
    dead_letter_path: str
    trends_view: str
    neardup: StreamingNearDup
    decontam: "StreamingDecontam | None" = None
    heavy_hitters: "StreamingHeavyHitters | None" = None
    reservoir: "StreamingReservoir | None" = None
    queries: list = field(default_factory=list)
    #: the RESOLVED gateway state layout: None = per-user fold,
    #: int = hash-slot bucket count (after "auto" promotion applied)
    gateway_buckets: "int | None" = None
    #: fused doc mode only: one dict per trigger with the shared-scan
    #: and per-consumer wall seconds ({batch_id, n_docs, read_tokenize,
    #: neardup, cms, decontam, reservoir, total}) — appended from the
    #: single doc foreachBatch thread; tools/stream_bench.py reads it
    #: for the per-leg p50/p95 the separate queries used to report.
    #: RING BUFFER (VERDICT r16 directive 4): a long-lived pipeline
    #: appends one dict per trigger forever (~31M/year at a 1 s tier),
    #: so only the newest DOC_LEG_RETAIN entries are retained — the
    #: same posture as Spark's own last-100 progress retention.
    doc_leg_s: "deque" = field(
        default_factory=lambda: deque(maxlen=DOC_LEG_RETAIN))

    def counts(self) -> tuple[int, int, int, int]:
        """(trades, dead_letters, near_dups, closed_trend_windows)."""
        spark = self.spark
        return (
            spark.read.schema(_SINK_STREAM_SCHEMA)
            .parquet(self.trades_path).count(),
            self.read_dead_letters(spark).count(),
            self.neardup.read_dups(spark).count(),
            spark.table(self.trends_view).count())

    def _raise_if_failed(self) -> None:
        for q in self.queries:
            if q.exception() is not None:
                raise q.exception()

    def wait_for(self, trades: int = 0, dead: int = 0, dups: int = 0,
                 windows: int = 0, timeout: float = 120.0
                 ) -> tuple[int, int, int, int]:
        """Poll until every output reaches its target count."""
        import time

        deadline = time.time() + timeout
        while time.time() < deadline:
            self._raise_if_failed()
            cur = self.counts()
            if (cur[0] >= trades and cur[1] >= dead
                    and cur[2] >= dups and cur[3] >= windows):
                return cur
            time.sleep(0.5)
        raise TimeoutError(f"pipeline outputs stuck at {self.counts()}")

    def wait_quiescent(self, stable_secs: float = 5.0,
                       timeout: float = 120.0) -> tuple[int, int, int, int]:
        """Poll until no output count changes for ``stable_secs``.

        The all-zero state gets a LONGER grace: before the first
        micro-batch commits, counts are legitimately (0,0,0,0) for
        several seconds of cold start — returning "quiescent at
        zero" there is a race, not a result (observed when the fused
        doc layout made startup faster than the 5 s window).  A
        genuinely empty input still terminates, just later."""
        import time

        deadline = time.time() + timeout
        last, t_last = None, time.time()
        while time.time() < deadline:
            self._raise_if_failed()
            cur = self.counts()
            # a query that still reports unconsumed input VETOES the
            # quiescence decision — output counts can sit still for
            # stable_secs while a slow leg (e.g. the doc query's
            # second cold trigger) has work queued.  A veto, not a
            # clock reset: isDataAvailable flaps True transiently
            # MID-trigger even at idle (observed on the trends leg
            # every few empty triggers), so resetting on it would
            # never converge; pending input holds it True steadily
            # BETWEEN triggers, which the veto catches.
            # (isTriggerActive is unusable either way: the gateway's
            # timeout-evaluation batches flap it forever — the PAA
            # livelock above.)
            busy = False
            for q in self.queries:
                try:
                    busy = busy or bool(
                        q.status.get("isDataAvailable"))
                except Exception:
                    pass
            need = stable_secs if any(cur) else max(stable_secs * 6,
                                                    30.0)
            if cur != last:
                last, t_last = cur, time.time()
            elif time.time() - t_last >= need and not busy:
                return cur
            time.sleep(0.5)
        raise TimeoutError(f"pipeline never quiesced: {self.counts()}")

    def stop(self) -> None:
        for q in self.queries:
            q.stop()

    def read_dead_letters(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(_DEAD_LETTER_SCHEMA).parquet(
            self.dead_letter_path)


def run_composed_pipeline(spark: SparkSession, requests_dir: str,
                          docs_dir: str, out_dir: str,
                          window_ms: int = DEFAULT_WINDOW_MS,
                          limit: int = DEFAULT_LIMIT,
                          trends_view: str = "pipeline_trends_live",
                          watermark: str = "10 minutes",
                          trigger: str | None = "1 second",
                          eval_df: DataFrame | None = None,
                          txn_sink: bool = True,
                          reservoir_k: int = 32,
                          requests_stream: DataFrame | None = None,
                          view_rebuild_days: int | None = None,
                          doc_trigger: str | None = None,
                          doc_files_per_trigger: int = 1,
                          neardup_compact_every: int = 32,
                          neardup_max_segments: int = 8,
                          neardup_shards: int = 1,
                          gateway_buckets: "int | str | None" = "auto",
                          expected_rows_per_trigger: int | None = None,
                          view_source: str = "manifest",
                          neardup_store: str = "rename",
                          txn_checkpoint_every: int | None = 128,
                          txn_retain_manifests: int | None = 256,
                          txn_publication: str = "rename",
                          doc_fused: bool = True,
                          allow_doc_ckpt_reset: bool = False,
                          ) -> ComposedPipeline:
    """Start the full composition and return its handles.

    ``requests_dir``: JSON-lines files in the ingest schema (the HTTP
    body shape, api.go:16-25).  ``docs_dir``: JSON-lines (doc_id,
    text) documents for the document-side probes — near-dup index,
    count-min heavy hitters, a uniform ``reservoir_k``-row reservoir
    sample (0 disables), and (when ``eval_df`` is given) the
    decontaminate-at-ingest screen.  ``out_dir``: all durable output
    (trades parquet, dead letters, indexes, checkpoints).
    ``requests_stream``: alternative ingest front door — a streaming
    DataFrame already in the ingest schema (e.g. the ``trades_gen``
    rate source, tools/stream_bench.py) used INSTEAD of the
    ``requests_dir`` file drops (pass requests_dir=None then).
    ``view_rebuild_days``: bound the live view's rebuild-from-storage
    window to the newest N trade-date partitions' horizon (VERDICT r10
    directive 4) — see the query-2 comment for semantics and cost.
    ``view_source``: "manifest" (default — the txn commit-log feed,
    bounded per-trigger cost) or "listing" (the pre-r14
    readStream.parquet file stream, O(total sink files) per trigger;
    only valid pairing for ``txn_sink=False``).
    ``neardup_store``: "rename" (default — atomic-rename segment
    commit, POSIX/HDFS) or "marker" (the object-store publication
    protocol: per-object PUTs + conditional-PUT commit marker, no
    rename anywhere — streaming/segment_store.py).
    ``doc_trigger`` / ``doc_files_per_trigger``: run the BACKGROUND
    document probes (near-dup, CMS, decontam, reservoir) on a slower,
    batchier trigger than the latency-critical import/trends legs —
    e.g. doc_trigger="2 seconds", doc_files_per_trigger=2 keeps doc
    throughput identical while halving their per-trigger fixed costs
    (state commits, python round trips) and their scheduling
    collisions with the import leg's tasks (FAIR shares slots but
    never preempts a running task — SCALE.md Round 12).  Defaults
    keep every query on ``trigger`` at 1 file per trigger (the r11
    behavior)."""
    import os

    if neardup_store not in ("rename", "marker"):
        raise ValueError(f"unknown neardup_store {neardup_store!r} "
                         "(expected 'rename' or 'marker')")
    # "auto" gateway promotion is the DEFAULT (r15 directive 6,
    # decided r16): it resolves up front against the declared offered
    # rate — None (per-user state) below the unit-pinned
    # PROMOTION_ROWS_PER_TRIGGER, the measured-better bucketed layout
    # above it.  Callers that declare no expected_rows_per_trigger
    # get the per-user gateway, byte-identical to the old default;
    # decisions are oracle-EXACT in either layout
    # (rate_limit_replay_bucketed).  Fail fast on a bad string.
    if gateway_buckets == "auto":
        from currency_market_pulse_spark.streaming.ratelimiter import (
            select_gateway_buckets,
        )
        gateway_buckets = select_gateway_buckets(
            expected_rows_per_trigger)
    elif isinstance(gateway_buckets, str):
        raise ValueError(f"gateway_buckets={gateway_buckets!r} "
                         "(expected an int, None, or 'auto')")
    if view_source not in ("manifest", "listing"):
        raise ValueError(f"unknown view_source {view_source!r} "
                         "(expected 'manifest' or 'listing')")
    if view_source == "manifest" and not txn_sink:
        raise ValueError("view_source='manifest' requires txn_sink=True "
                         "(the plain sink writes no manifest log); "
                         "pass view_source='listing'")

    # ---- doc-checkpoint MIGRATION guard (ADVICE r16, medium): the
    # fused doc side checkpoints under ckpt_docs; the independent legs
    # checkpoint under ckpt_{neardup,cms,decontam,reservoir}.  Batch-id
    # idempotency does NOT protect across a mode switch — a fresh
    # checkpoint restarts at batch 0 with NEW batch-id boundaries, so
    # CMS per-batch delta partitions double-count every previously
    # processed doc and near-dup re-probes docs already in the standing
    # index.  Fail fast when a resume would silently re-ingest; the
    # migration path is: drain the old deployment, move/clear out_dir's
    # doc outputs (cms/, decontam_flags/, reservoir/, dups/ + index),
    # then restart with allow_doc_ckpt_reset=True (or a fresh out_dir).
    _legacy_legs = [n for n in ("ckpt_neardup", "ckpt_cms",
                                "ckpt_decontam", "ckpt_reservoir")
                    if os.path.isdir(os.path.join(out_dir, n))
                    and os.listdir(os.path.join(out_dir, n))]
    _fused_ckpt = (os.path.isdir(os.path.join(out_dir, "ckpt_docs"))
                   and os.listdir(os.path.join(out_dir, "ckpt_docs")))
    if not allow_doc_ckpt_reset:
        if doc_fused and _legacy_legs and not _fused_ckpt:
            raise RuntimeError(
                "doc_fused=True would start a fresh ckpt_docs checkpoint "
                f"while legacy per-leg checkpoints exist ({_legacy_legs}): "
                "the doc dir would be re-ingested from batch 0 with new "
                "batch-id boundaries (CMS deltas double-count, near-dup "
                "re-probes indexed docs). Either resume with "
                "doc_fused=False, or clear the doc outputs and pass "
                "allow_doc_ckpt_reset=True.")
        if not doc_fused and _fused_ckpt and not _legacy_legs:
            raise RuntimeError(
                "doc_fused=False would start fresh per-leg checkpoints "
                "while a fused ckpt_docs checkpoint exists: the doc dir "
                "would be re-ingested from batch 0 (same double-count "
                "hazard). Either resume with doc_fused=True, or clear "
                "the doc outputs and pass allow_doc_ckpt_reset=True.")

    def _in_pool(name, start_fn):
        # one FAIR pool per streaming query (session.py sets
        # spark.scheduler.mode=FAIR): the pool name is a thread-local
        # property inherited by the query's execution thread at
        # start(), so the six queries' micro-batch jobs share task
        # slots fairly instead of head-of-line-blocking each other.
        sc = spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", f"stream-{name}")
        try:
            return start_fn()
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    trades_path = f"{out_dir}/trades"
    dead_path = f"{out_dir}/dead_letter"
    # the live-view file stream and the dead-letter reader start
    # before the first batch writes — pre-create the directories so an
    # explicit-schema read of the not-yet-written dataset is an empty
    # relation, not PATH_NOT_FOUND
    os.makedirs(trades_path, exist_ok=True)
    os.makedirs(dead_path, exist_ok=True)
    os.makedirs(f"{out_dir}/dups", exist_ok=True)

    # ---- query 1: gateway -> normalize -> idempotent parquet sink
    raw = (requests_stream if requests_stream is not None
           else spark.readStream.schema(INGEST_SCHEMA)
           .option("maxFilesPerTrigger", "1").json(requests_dir))
    # event_id = xxhash64 of the payload JSON; hashing the payload
    # COLUMN (not a second to_json of the same struct) serializes each
    # row once — the projection stays whole-stage-codegen'd either
    # way, this just halves its to_json work.
    requests = raw.select(
        F.col("userId").alias("user_id"),
        (F.unix_timestamp(parse_time_placed(F.col("timePlaced"))) * 1000)
        .alias("ts_ms"),
        F.to_json(F.struct(*raw.columns)).alias("payload"),
    ).withColumn("event_id", F.xxhash64("payload")) \
     .filter(F.col("ts_ms").isNotNull())   # malformed -> 400 pre-gate
    # gateway_buckets: the cardinality-scale switch — hash-slot
    # bucketed state caps the stateful op's groups-per-trigger
    # (identical admission decisions, test-pinned; measured at 100k
    # users: trigger p50 1.9 s per-user vs 1.25 s bucketed, SCALE.md
    # Round 13).  None keeps the per-user twin of the reference's
    # Redis keys with engine-managed idle expiry.  "auto" (already
    # resolved above) applies the promotion criterion
    # (ratelimiter.select_gateway_buckets, r14 directive 4): per-user
    # below PROMOTION_ROWS_PER_TRIGGER of expected_rows_per_trigger,
    # auto_buckets-sized bucketed above.
    decisions = (rate_limit_gateway_bucketed(
        requests, window_ms, limit, buckets=gateway_buckets)
        if gateway_buckets
        else rate_limit_gateway(requests, window_ms, limit))
    # write-once txn sink by default: the live view's file stream is
    # exactly-once under crash-replay (module docstring; txn_sink.py)
    # txn_checkpoint_every: Delta-style checkpoint compaction of the
    # sink's txn log — bounds the manifest view's rebuild-from-scratch
    # to one columnar read + <=interval manifest JSONs instead of
    # O(committed batches) (txn_sink.py / txn_log_source.py; VERDICT
    # r14 directive 2).  128 batches ~= one checkpoint every ~2 min at
    # the 1 s trigger; the write is driver-side, O(history) bytes but
    # OFF the per-trigger path for the other 127 batches.
    # txn_publication="put" runs the object-store file-publication
    # twin (copy+fsync, no cross-directory rename — txn_sink.py
    # OBJECT-STORE PUBLICATION); requires the manifest-fed view,
    # which is the default pairing anyway.
    # txn_retain_manifests: bound _txn/'s FILE COUNT too — manifests
    # below the durable checkpoint floor are deleted (re-derivable
    # from the checkpoint), keeping the log at O(interval + retain)
    # files instead of one JSON per batch forever (VERDICT r15
    # directive 2).  None keeps everything.  Retention is ON by
    # default since r17 (retain=256 with the 128-batch checkpoint
    # interval bounds _txn/ at ~O(400) files at any uptime; the
    # r17 soak measured the live file count flat while the view
    # served) — the composed pipeline is the long-lived deployment
    # surface, and an unbounded control log is an operational leak
    # even when never read.
    sink = (TxnParquetTradesSink(trades_path,
                                 checkpoint_every=txn_checkpoint_every,
                                 retain_manifests=txn_retain_manifests,
                                 publication=txn_publication)
            if txn_sink else ParquetTradesSink(trades_path))

    def import_batch(batch: DataFrame, batch_id: int) -> None:
        # TWO actions consume this micro-batch (sink + dead letter);
        # persist so the stateful gateway upstream executes ONCE per
        # epoch — re-running a state-store operator inside the same
        # epoch is undefined (and measured to crash the worker).
        batch = batch.persist()
        try:
            admitted = batch.filter(F.col("admitted"))
            trades = normalize_trades(
                parse_ingest_json(admitted.select("payload"), "payload"))
            sink.write(trades.filter(F.col("time_placed").isNotNull()),
                       batch_id)
            # dead-letter the rejects WITH their retry hint (429 twin);
            # repartition(1): rejects are a trickle — one file per
            # batch, not one per gateway state partition (and the
            # shuffle boundary keeps the cached stateful lineage from
            # collapsing into a single task if the cache was evicted).
            # The isEmpty probe runs over the ALREADY-MATERIALIZED
            # cache (the sink write above was the batch's first
            # action), so the common all-admitted trigger pays one
            # ~40 ms limit-1 cache scan instead of a full
            # shuffle+write job (~150 ms measured solo, r12 import-leg
            # decomposition) — and a replayed batch that HAD rejects
            # re-derives them deterministically, so idempotency is
            # unchanged.
            rejects = batch.filter(~F.col("admitted"))
            if not rejects.isEmpty():
                (rejects
                 .select("user_id", "event_id", "ts_ms", "n_in_window",
                         "retry_after_ms")
                 .withColumn("batch_id", F.lit(batch_id).cast("long"))
                 .repartition(1)
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("batch_id").parquet(dead_path))
        finally:
            batch.unpersist()

    # The gateway is stateful with a PROCESSING-TIME timeout: under
    # the default ASAP trigger the engine schedules back-to-back empty
    # micro-batches to evaluate timeouts, which livelocks
    # processAllAvailable (measured: 100+ empty epochs, state-store
    # snapshot maintenance falling behind).  The importer's 1s flush
    # trigger (T2, streaming/importer.py FLUSH_INTERVAL) paces the
    # query AND restores an idle point between batches.
    writer = (decisions.writeStream
              .option("checkpointLocation", f"{out_dir}/ckpt_import")
              .outputMode("append").foreachBatch(import_batch))
    if trigger:
        writer = writer.trigger(processingTime=trigger)
    q_import = _in_pool("import", writer.start)

    # ---- query 2: live trends OVER THE SINK's files (storage hand-off)
    # The memory-sink view is EPHEMERAL by construction — it dies with
    # the process, and Spark refuses checkpoint recovery for memory
    # sinks.  Correct restart semantics are therefore rebuild-from-
    # storage: drop the view's checkpoint so the file stream re-reads
    # every visible (write-once, hence consistent) sink file and
    # reconstructs the full view.  The durable truth is the sink; the
    # view is a cache of it (tests/test_pipeline_crash_restart.py
    # proves the rebuilt view equals an uninterrupted run's).
    import shutil
    shutil.rmtree(f"{out_dir}/ckpt_trends", ignore_errors=True)
    # Bounded rebuild (VERDICT r10 directive 4): unbounded, the boot
    # cost grows with the sink's whole history.  With
    # ``view_rebuild_days`` set, the rebuild reads only trade_date
    # partitions within N days of the newest one — the cutoff comes
    # from the partition DIRECTORY NAMES (no data scan).  Boot cost
    # is then O(horizon partitions), not O(history).  Semantics: the
    # view serves the horizon — rows older than the cutoff (including
    # ones arriving AFTER boot, which the watermark would expire
    # anyway) are batch-path territory, exactly the live-view/batch
    # split the trends_stream docstring documents for late data.
    cutoff = None
    if view_rebuild_days is not None:
        import datetime as _dt
        dates = [d.split("=", 1)[1] for d in os.listdir(trades_path)
                 if d.startswith("trade_date=")]
        if dates:
            cutoff = (max(_dt.date.fromisoformat(x) for x in dates)
                      - _dt.timedelta(days=view_rebuild_days - 1))
    # view_source="manifest" (default, VERDICT r13 directive 1): feed
    # the view from the txn sink's per-batch manifest LOG
    # (sources/txn_log_source.py) — per-trigger cost is O(new
    # batches) manifest probes, never a directory listing.  The old
    # "listing" mode (readStream.parquet over the sink tree) re-lists
    # the WHOLE sink every trigger to diff its seen-set — O(total
    # files in history) driver-side work, measured growing 1.6 ->
    # 3.7 s view p95 across the r13 900 s soak (~4,000 files);
    # retained only for the plain-overwrite sink, which writes no
    # manifests (and whose replay double-counting the txn sink was
    # built to fix — module docstring).
    if view_source == "manifest":
        from currency_market_pulse_spark.sources.txn_log_source import (
            TxnTradesManifestDataSource,
        )
        spark.dataSource.register(TxnTradesManifestDataSource)
        reader = (spark.readStream.format("txn_trades")
                  .option("path", trades_path))
        if cutoff is not None:
            reader = reader.option("cutoffDate", cutoff.isoformat())
        sink_stream = reader.load()
    else:
        sink_stream = (spark.readStream.schema(_SINK_STREAM_SCHEMA)
                       .parquet(trades_path))
        if cutoff is not None:
            # filter on the partition column: pruned files contribute
            # only listing cost, never content reads
            sink_stream = sink_stream.filter(
                F.col("trade_date") >= F.lit(cutoff))
    trends_writer = (trends_live(sink_stream, watermark=watermark)
                     .writeStream.format("memory").queryName(trends_view)
                     .option("checkpointLocation", f"{out_dir}/ckpt_trends")
                     .outputMode("append"))
    if trigger:
        trends_writer = trends_writer.trigger(processingTime=trigger)
    q_trends = _in_pool("trends", trends_writer.start)

    # ---- query 3: streaming near-dup index probe over the doc stream
    d_trigger = doc_trigger if doc_trigger is not None else trigger
    d_files = str(doc_files_per_trigger)

    def _doc_stream():
        return (spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", d_files).json(docs_dir))

    from currency_market_pulse_spark.streaming.segment_store import (
        MarkerSegmentStore, RenameSegmentStore,
    )
    seg_store = (MarkerSegmentStore() if neardup_store == "marker"
                 else RenameSegmentStore())
    nd = StreamingNearDup(bands_path=f"{out_dir}/idx_bands",
                          shingles_path=f"{out_dir}/idx_shingles",
                          hashes_path=f"{out_dir}/idx_hashes",
                          dups_path=f"{out_dir}/dups",
                          compact_every=neardup_compact_every,
                          max_segments=neardup_max_segments,
                          # ops timeline: one JSON line per segment
                          # write (minor fold / tier major) — cheap,
                          # and the soak bench reads it back
                          events_path=f"{out_dir}/compaction_events.jsonl",
                          segment_store=seg_store,
                          # band-hash sharding: S independent index
                          # roots probed concurrently, dup-for-dup
                          # equal to shards=1 (neardup_stream.py)
                          shards=neardup_shards)
    hh = StreamingHeavyHitters(sketch_path=f"{out_dir}/cms_sketch",
                               cand_path=f"{out_dir}/cms_cand")
    sd = None
    if eval_df is not None:
        sd = StreamingDecontam(eval_df,
                               eval_index_path=f"{out_dir}/eval_idx",
                               flags_path=f"{out_dir}/decontam_flags")
    rs = None
    if reservoir_k:
        rs = StreamingReservoir(
            reservoir_path=f"{out_dir}/reservoir", k=reservoir_k,
            weight_col=None)

    pipe_handle = ComposedPipeline(
        spark=spark,
        trades_path=trades_path, dead_letter_path=dead_path,
        trends_view=trends_view, neardup=nd,
        decontam=sd, heavy_hitters=hh, reservoir=rs,
        gateway_buckets=gateway_buckets)

    if doc_fused:
        # ---- queries 3-6 FUSED (VERDICT r15 directive 1): ONE doc
        # stream, ONE foreachBatch that reads + tokenizes the batch
        # once and drives all four doc consumers off the shared
        # cached relations.  The four independent legs each re-read
        # and re-tokenized the SAME file every trigger — 3 of 4
        # doc-side scans+tokenizations were redundant by construction
        # (measured: composed tier-1 near-dup p50 3,559 ms vs
        # 1,900 ms solo).  Every consumer stays batch-id idempotent,
        # so the single checkpoint replays one batch into all four
        # handlers safely; outputs are bit-equal to the independent
        # legs (tokens() is deterministic — pinned in
        # tests/test_pipeline_stream.py).  Trade-off, stated: the
        # legs now share one query, so one leg's failure stops the
        # doc side as a unit (the import/trends legs are unaffected),
        # and per-leg timings come from doc_leg_s instead of
        # per-query progress.
        import time as _time

        from currency_market_pulse_spark.functions.text import tokens

        from concurrent.futures import ThreadPoolExecutor

        def doc_batch(batch: DataFrame, batch_id: int) -> None:
            t0 = _time.time()
            batch = batch.persist()
            toks = batch.select(
                "doc_id", tokens(F.col("text")).alias("_t")).persist()
            legs = {"batch_id": batch_id}

            def _timed(fn, *a, **kw) -> float:
                # worker threads get fresh JVM threads outside the
                # query's FAIR pool — pin them back to the doc pool
                spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", "stream-docs")
                t = _time.time()
                fn(*a, **kw)
                return round(_time.time() - t, 4)

            try:
                # one pass materializes BOTH caches (toks reads batch)
                legs["n_docs"] = toks.count()
                legs["read_tokenize"] = round(_time.time() - t0, 4)
                # the near-dup probe runs FIRST and alone — its
                # driver-orchestrated collect sequence is the doc
                # side's critical path, and light-leg jobs queuing
                # under it were measured at +0.8 s on its p50; the
                # three light consumers then overlap with EACH OTHER
                # over the same caches (their wall is dominated by
                # fixed job-scheduling floor, so the overlap recovers
                # most of what sequentializing them would cost).
                legs["neardup"] = _timed(
                    nd.process_batch, batch, batch_id, toks=toks)
                with ThreadPoolExecutor(max_workers=3) as pool:
                    futs = {"cms": pool.submit(
                        _timed, hh.process_batch, batch, batch_id,
                        toks=toks)}
                    if sd is not None:
                        futs["decontam"] = pool.submit(
                            _timed, sd.process_batch, batch, batch_id,
                            toks=toks)
                    if rs is not None:
                        futs["reservoir"] = pool.submit(
                            _timed, rs.process_batch, batch, batch_id)
                    for name, fut in futs.items():
                        legs[name] = fut.result()
            finally:
                toks.unpersist()
                batch.unpersist()
            legs["total"] = round(_time.time() - t0, 4)
            try:
                legs["rdd_cache_entries"] = (
                    spark.sparkContext._jsc.getPersistentRDDs().size())
            except Exception:
                pass
            pipe_handle.doc_leg_s.append(legs)

        doc_writer = (_doc_stream().writeStream
                      .foreachBatch(doc_batch)
                      .option("checkpointLocation", f"{out_dir}/ckpt_docs")
                      .outputMode("update"))
        if d_trigger:
            doc_writer = doc_writer.trigger(processingTime=d_trigger)
        pipe_handle.queries = [q_import, q_trends,
                               _in_pool("docs", doc_writer.start)]
        return pipe_handle

    # ---- queries 3-6 as INDEPENDENT legs (doc_fused=False): each
    # consumer re-reads and re-tokenizes the doc stream — kept for
    # the fused-vs-independent equality gate and A/B measurement
    q_dedup = _in_pool("neardup", lambda: nd.attach(
        _doc_stream(), f"{out_dir}/ckpt_neardup", trigger=d_trigger))
    queries = [q_import, q_trends, q_dedup]
    queries.append(_in_pool("cms", lambda: hh.attach(
        _doc_stream(), f"{out_dir}/ckpt_cms", trigger=d_trigger)))
    if sd is not None:
        queries.append(_in_pool("decontam", lambda: sd.attach(
            _doc_stream(), f"{out_dir}/ckpt_decontam",
            trigger=d_trigger)))
    if rs is not None:
        queries.append(_in_pool("reservoir", lambda: rs.attach(
            _doc_stream(), f"{out_dir}/ckpt_reservoir",
            trigger=d_trigger)))
    pipe_handle.queries = queries
    return pipe_handle
