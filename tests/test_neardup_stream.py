"""Streaming near-dup: a later micro-batch's document is flagged
against the standing corpus index, distinct documents are not, and
crash-replay of a batch is idempotent (no duplicate index rows, no
self-matching)."""

from __future__ import annotations

import json
import os

from currency_market_pulse_spark.streaming.neardup_stream import (
    StreamingNearDup,
)

BASE = ("the quick brown fox jumps over the lazy dog while the calm "
        "river flows past the old stone bridge at dawn")
NEAR = BASE.replace("dawn", "dusk")          # one token differs
DISTINCT = ("completely unrelated text about parquet row groups and "
            "shuffle partitions in a distributed query engine runtime")


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def _handler(tmp_path):
    return StreamingNearDup(
        bands_path=str(tmp_path / "idx_bands"),
        shingles_path=str(tmp_path / "idx_shingles"),
        dups_path=str(tmp_path / "dups"))


def test_stream_flags_cross_batch_near_dup(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(src / "f1.json", [{"doc_id": 1, "text": BASE}], 1_000_000)
    _write(src / "f2.json", [{"doc_id": 2, "text": NEAR},
                             {"doc_id": 3, "text": DISTINCT}], 1_000_100)

    nd = _handler(tmp_path)
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    q = nd.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    dups = {r.new_id: (r.dup_of, r.jaccard)
            for r in spark.read.parquet(nd.dups_path).collect()}
    assert 2 in dups and dups[2][0] == 1 and dups[2][1] >= 0.5
    assert 3 not in dups and 1 not in dups
    idx = nd.read_bands(spark)
    assert {r.doc_id for r in idx.select("doc_id").distinct().collect()} \
        == {1, 2, 3}


def test_within_batch_near_dup_flagged(spark, tmp_path):
    """Two near-identical docs arriving in the SAME micro-batch: the
    higher id is flagged against the lower (first-owner convention),
    even with no standing index yet."""
    nd = _handler(tmp_path)
    b0 = spark.createDataFrame([(10, BASE), (11, NEAR), (12, DISTINCT)],
                               "doc_id long, text string")
    nd.process_batch(b0, 0)
    dups = {r.new_id: r.dup_of
            for r in spark.read.parquet(nd.dups_path).collect()}
    assert dups == {11: 10}


def test_replayed_batch_is_idempotent(spark, tmp_path):
    nd = _handler(tmp_path)
    b0 = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    b1 = spark.createDataFrame([(2, NEAR)], "doc_id long, text string")
    nd.process_batch(b0, 0)
    nd.process_batch(b1, 1)
    first_dups = sorted((r.new_id, r.dup_of, r.jaccard) for r in
                        spark.read.parquet(nd.dups_path).collect())
    first_idx = nd.read_shingles(spark).count()

    nd.process_batch(b1, 1)  # crash-replay of the same batch
    replay_dups = sorted((r.new_id, r.dup_of, r.jaccard) for r in
                         spark.read.parquet(nd.dups_path).collect())
    assert replay_dups == first_dups == [(2, 1, replay_dups[0][2])]
    # the replay must not have appended a second copy of batch 1's rows
    assert nd.read_shingles(spark).count() == first_idx


def test_stream_survives_empty_first_batch(spark, tmp_path):
    """A first batch whose docs are all shorter than the shingle width
    produces EMPTY index partitions (no parquet footers); the standing
    index must still read back (explicit schemas, ADVICE r5) and a
    later batch must dedup normally."""
    src = tmp_path / "in"
    src.mkdir()
    _write(src / "f1.json", [{"doc_id": 1, "text": "too short"}],
           1_000_000)
    _write(src / "f2.json", [{"doc_id": 2, "text": BASE}], 1_000_100)
    _write(src / "f3.json", [{"doc_id": 3, "text": NEAR}], 1_000_200)

    nd = _handler(tmp_path)
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    q = nd.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    dups = {r.new_id: r.dup_of for r in nd.read_dups(spark).collect()}
    assert dups == {3: 2}


def test_read_dups_on_all_empty_partitions(spark, tmp_path):
    """Even when EVERY batch so far flagged nothing, the dup log reads
    back as an empty typed relation — not an inference error."""
    src = tmp_path / "in"
    src.mkdir()
    _write(src / "f1.json", [{"doc_id": 1, "text": "x"}], 1_000_000)

    nd = _handler(tmp_path)
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .json(str(src)))
    q = nd.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = nd.read_dups(spark)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "new_id", "dup_of", "jaccard", "batch_id"]


def _run_batches(nd, spark, texts_by_batch):
    """Feed (batch_id -> [(doc_id, text)]) through process_batch."""
    for bid in sorted(texts_by_batch):
        df = spark.createDataFrame(texts_by_batch[bid],
                                   "doc_id long, text string")
        nd.process_batch(df, bid)


def _dup_set(nd, spark):
    return {(r.new_id, r.dup_of, r.jaccard)
            for r in nd.read_dups(spark).collect()}


def _corpus(n, salt=""):
    """n mutually-distinct documents long enough to shingle (every
    token carries the doc index, so cross-doc jaccard is ~0)."""
    return [(i, " ".join(f"w{salt}{i}x{j}k{i * 31 + j * 7}"
                         for j in range(20)))
            for i in range(n)]


def test_compaction_preserves_results_and_bounds_tail(spark, tmp_path):
    """A run WITH compaction flags exactly the dups a run WITHOUT it
    flags, folds the tail into base segments, and keeps probing
    correctly afterwards (including a post-compaction near-dup of a
    pre-compaction document)."""
    batches = {i: [(i * 10, t)] for i, (_, t) in enumerate(_corpus(6))}
    batches[2] = [(25, BASE)]
    batches[6] = [(61, NEAR)]           # near-dup of batch 2's doc 25
    batches[7] = [(71, batches[3][0][1])]   # exact dup of batch 3's doc

    nd_c = StreamingNearDup(
        bands_path=str(tmp_path / "c_bands"),
        shingles_path=str(tmp_path / "c_shingles"),
        dups_path=str(tmp_path / "c_dups"),
        compact_every=3, n_buckets=4)
    nd_p = StreamingNearDup(          # plain: compaction disabled
        bands_path=str(tmp_path / "p_bands"),
        shingles_path=str(tmp_path / "p_shingles"),
        dups_path=str(tmp_path / "p_dups"),
        compact_every=0, n_buckets=4)
    _run_batches(nd_c, spark, batches)
    _run_batches(nd_p, spark, batches)

    dups = _dup_set(nd_c, spark)
    assert dups == _dup_set(nd_p, spark)
    assert {(n, d) for n, d, _ in dups} == {(61, 25), (71, 30)}
    # the standing index is identical either way
    assert (sorted(nd_c.read_bands(spark).collect())
            == sorted(nd_p.read_bands(spark).collect()))
    assert (nd_c.read_shingles(spark).count()
            == nd_p.read_shingles(spark).count())
    # tail is bounded: every batch below the last compaction (id 6)
    # was folded into base segments.  Batch 7's doc was an EXACT copy
    # of standing content — the exact fast path flags it (above) and
    # contributes nothing to the index, so only batch 6 has a tail dir.
    import os
    tail = os.path.join(nd_c.bands_path, "tail")
    ids = {int(d.split("=")[1]) for d in os.listdir(tail)}
    assert ids == {6}
    assert 71 not in {r.doc_id
                      for r in nd_c.read_bands(spark).collect()}
    base = os.path.join(nd_c.bands_path, "base")
    assert any(d.startswith("segment=") for d in os.listdir(base))


def test_major_compaction_merges_segments(spark, tmp_path):
    """When the segment count would exceed max_segments, compaction
    merges all existing segments into one — file count stays bounded."""
    nd = StreamingNearDup(
        bands_path=str(tmp_path / "bands"),
        shingles_path=str(tmp_path / "shingles"),
        dups_path=str(tmp_path / "dups"),
        compact_every=2, n_buckets=4, max_segments=2)
    batches = {i: [r] for i, r in enumerate(_corpus(9))}
    _run_batches(nd, spark, batches)
    import os
    base = os.path.join(nd.bands_path, "base")
    segs = [d for d in os.listdir(base) if d.startswith("segment=")]
    assert len(segs) <= 2
    assert nd.read_bands(spark).select("doc_id").distinct().count() == 9


def test_compaction_crash_recovery(spark, tmp_path):
    """Both crash points of the compaction protocol: (a) manifest+tmp
    left behind => rolled back, every row still probed exactly once;
    (b) manifest+segment left behind (consumed dirs not yet deleted)
    => rolled forward, no row probed twice (a double-counted shingle
    relation would corrupt jaccard above 1.0 or change dup verdicts)."""
    import json as _json
    import os
    import shutil

    def fresh(tag):
        nd = StreamingNearDup(
            bands_path=str(tmp_path / f"{tag}_bands"),
            shingles_path=str(tmp_path / f"{tag}_shingles"),
            dups_path=str(tmp_path / f"{tag}_dups"),
            compact_every=0, n_buckets=4)
        _run_batches(nd, spark, {0: [(1, BASE)], 1: [(2, DISTINCT)]})
        return nd

    # (a) crash BEFORE the swap: tmp + manifest exist, consumed intact
    nd = fresh("a")
    root = nd.bands_path
    os.makedirs(os.path.join(root, "_compacting_segment"))
    with open(os.path.join(root, "_compaction_manifest"), "w") as f:
        _json.dump({"segment": 2, "consumed": ["tail/batch_id=0"]}, f)
    nd.process_batch(spark.createDataFrame([(3, NEAR)],
                                           "doc_id long, text string"), 2)
    assert {(r.new_id, r.dup_of)
            for r in nd.read_dups(spark).collect()} == {(3, 1)}
    assert not os.path.exists(os.path.join(root, "_compaction_manifest"))
    assert not os.path.exists(os.path.join(root, "_compacting_segment"))

    # (b) crash AFTER the swap: segment live, consumed dirs still
    # present, manifest records them — recovery must delete them so the
    # duplicate rows are never probed twice
    nd = fresh("b")
    nd2 = StreamingNearDup(bands_path=nd.bands_path,
                           shingles_path=nd.shingles_path,
                           dups_path=nd.dups_path,
                           compact_every=0, n_buckets=4)
    nd2.compact(spark, upto_batch_id=2)   # completed compaction
    # re-create the "consumed not yet deleted" state by copying the
    # base rows back into a tail dir and restoring the manifest
    for r, bucket in ((nd.bands_path, "sig_bucket"),
                      (nd.shingles_path, "id_bucket")):
        seg = os.path.join(r, "base", "segment=2")
        ghost = os.path.join(r, "tail", "batch_id=0")
        os.makedirs(ghost, exist_ok=True)
        for sub in os.listdir(seg):
            if sub.startswith(bucket):
                for fn in os.listdir(os.path.join(seg, sub)):
                    shutil.copy(os.path.join(seg, sub, fn),
                                os.path.join(ghost, fn))
        with open(os.path.join(r, "_compaction_manifest"), "w") as f:
            _json.dump({"segment": 2,
                        "consumed": ["tail/batch_id=0"]}, f)
    nd.process_batch(spark.createDataFrame([(3, NEAR)],
                                           "doc_id long, text string"), 3)
    dups = {(r.new_id, r.dup_of): r.jaccard
            for r in nd.read_dups(spark).collect()}
    assert set(dups) == {(3, 1)} and dups[(3, 1)] <= 1.0
    # the ghost tail dir is gone: each row lives in exactly one tier
    assert nd.read_bands(spark).count() == \
        nd.read_bands(spark).dropDuplicates().count()


def test_probe_prunes_base_buckets(spark, tmp_path):
    """The probe's base read carries a PartitionFilter on sig_bucket:
    only directories holding the batch's band signatures are scanned."""
    nd = StreamingNearDup(
        bands_path=str(tmp_path / "bands"),
        shingles_path=str(tmp_path / "shingles"),
        dups_path=str(tmp_path / "dups"),
        compact_every=0, n_buckets=8)
    nd.seed_index(spark.createDataFrame(_corpus(40),
                                        "doc_id long, text string"))
    df = nd._read_base(spark, nd.bands_path,
                       "doc_id bigint, band int, band_sig string",
                       "sig_bucket", buckets=[0, 1])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "sig_bucket" in plan
    n_all = len(nd._read_base(
        spark, nd.bands_path, "doc_id bigint, band int, band_sig string",
        "sig_bucket").inputFiles())
    assert n_all >= 6  # seeded index actually spans most buckets


def test_seeded_index_is_probed(spark, tmp_path):
    """seed_index bulk-loads a base segment the streaming probe treats
    exactly like compacted history."""
    nd = StreamingNearDup(
        bands_path=str(tmp_path / "bands"),
        shingles_path=str(tmp_path / "shingles"),
        dups_path=str(tmp_path / "dups"))
    nd.seed_index(spark.createDataFrame(
        [(100, BASE), (101, DISTINCT)], "doc_id long, text string"))
    nd.process_batch(spark.createDataFrame(
        [(200, NEAR)], "doc_id long, text string"), 0)
    dups = {(r.new_id, r.dup_of) for r in nd.read_dups(spark).collect()}
    assert dups == {(200, 100)}


def test_exact_fast_path_flags_and_skips_indexing(spark, tmp_path):
    """An exact copy of standing content is flagged at jaccard 1.0 via
    the hash fast path, is NOT appended to any index relation, and a
    LATER exact copy still matches the FIRST-ingested doc's hash
    (transitivity — the index grows with novel content only)."""
    nd = _handler(tmp_path)
    nd.process_batch(spark.createDataFrame([(1, BASE)],
                                           "doc_id long, text string"), 0)
    nd.process_batch(spark.createDataFrame([(2, BASE)],
                                           "doc_id long, text string"), 1)
    nd.process_batch(spark.createDataFrame([(3, BASE)],
                                           "doc_id long, text string"), 2)
    dups = {r.new_id: (r.dup_of, r.jaccard)
            for r in nd.read_dups(spark).collect()}
    assert dups == {2: (1, 1.0), 3: (1, 1.0)}
    assert {r.doc_id for r in nd.read_bands(spark).collect()} == {1}
    assert {r.doc_id for r in nd.read_hashes(spark).collect()} == {1}
    assert nd.read_shingles(spark).select("doc_id").distinct().count() == 1


def test_exact_within_batch_keeps_one_owner(spark, tmp_path):
    """Two exact copies in ONE batch: the lower id owns, the higher is
    flagged against it, and only the owner is indexed."""
    nd = _handler(tmp_path)
    nd.process_batch(spark.createDataFrame(
        [(10, BASE), (11, BASE), (12, DISTINCT)],
        "doc_id long, text string"), 0)
    dups = {r.new_id: (r.dup_of, r.jaccard)
            for r in nd.read_dups(spark).collect()}
    assert dups == {11: (10, 1.0)}
    assert {r.doc_id for r in nd.read_hashes(spark).collect()} \
        == {10, 12}


def test_exact_and_near_mix_in_one_batch(spark, tmp_path):
    """A batch carrying an exact copy AND a near copy of standing
    content: the exact one takes the fast path, the near one still
    goes through the minhash probe, and both are flagged."""
    nd = _handler(tmp_path)
    nd.process_batch(spark.createDataFrame([(1, BASE)],
                                           "doc_id long, text string"), 0)
    nd.process_batch(spark.createDataFrame(
        [(2, BASE), (3, NEAR)], "doc_id long, text string"), 1)
    dups = {r.new_id: r.dup_of for r in nd.read_dups(spark).collect()}
    assert dups == {2: 1, 3: 1}
    # the near copy is novel content -> indexed; the exact copy is not
    assert {r.doc_id for r in nd.read_hashes(spark).collect()} == {1, 3}


def test_exact_replay_is_idempotent(spark, tmp_path):
    """Crash-replay of a batch whose docs were exact dups: no
    double-flagging, no self-matching via its own prior hash rows."""
    nd = _handler(tmp_path)
    nd.process_batch(spark.createDataFrame([(1, BASE)],
                                           "doc_id long, text string"), 0)
    b1 = spark.createDataFrame([(2, BASE)], "doc_id long, text string")
    nd.process_batch(b1, 1)
    first = sorted((r.new_id, r.dup_of, r.jaccard)
                   for r in nd.read_dups(spark).collect())
    nd.process_batch(b1, 1)   # replay
    again = sorted((r.new_id, r.dup_of, r.jaccard)
                   for r in nd.read_dups(spark).collect())
    assert first == again == [(2, 1, 1.0)]
    assert nd.read_hashes(spark).count() == 1


def test_tiered_compaction_spares_largest_segment(spark, tmp_path):
    """Size-tiered major compaction (r12): when the segment count
    exceeds max_segments, only the SMALLEST max_segments//2+1 are
    merged — the big old segment survives untouched, so its bytes are
    not rewritten (the write-amplification win merge_all cannot have;
    tools/compaction_bench.py measures the delta)."""
    nd = StreamingNearDup(
        bands_path=str(tmp_path / "bands"),
        shingles_path=str(tmp_path / "shingles"),
        dups_path=str(tmp_path / "dups"),
        compact_every=0, n_buckets=4, max_segments=2)
    # the big segment must out-ROW the two 1-doc segments combined
    # (the carry guard compares row counts via _dir_rows — the byte
    # guard was abandoned because footer overhead floors a 1-doc file
    # at a few KB, see _dir_rows) — 150 distinct docs does it
    big = [(i, f"{DISTINCT} salt{i} " + " ".join(
        f"w{i}x{j}" for j in range(60))) for i in range(150)]
    nd.process_batch(spark.createDataFrame(big,
                                           "doc_id long, text string"), 0)
    nd.compact(spark, upto_batch_id=1)          # segment=1 (big)
    nd.process_batch(spark.createDataFrame(
        [(100, BASE)], "doc_id long, text string"), 1)
    nd.compact(spark, upto_batch_id=2)          # segment=2 (small)
    nd.process_batch(spark.createDataFrame(
        [(101, DISTINCT)], "doc_id long, text string"), 2)
    nd.compact(spark, upto_batch_id=3)          # 3rd -> tier merge
    base = os.path.join(nd.bands_path, "base")
    ids = sorted(int(d.split("=", 1)[1]) for d in os.listdir(base)
                 if d.startswith("segment="))
    assert len(ids) <= 2
    assert 1 in ids                 # the big segment was NOT rewritten
    assert any(i >= 10 ** 12 for i in ids)   # the tier-merge segment
    got = {r.doc_id
           for r in nd.read_bands(spark).select("doc_id").distinct()
           .collect()}
    assert got == {i for i, _ in big} | {100, 101}


def test_rebucketed_index_serves_identical_dups(spark, tmp_path):
    """Bucket-count scaling (r12): an index whose compaction rescaled
    n_buckets (tiny target_bucket_bytes) serves exactly the dups the
    floor-bucketed index serves — mixed bucket generations included."""
    def run(sub, **kw):
        nd = StreamingNearDup(
            bands_path=str(tmp_path / sub / "bands"),
            shingles_path=str(tmp_path / sub / "shingles"),
            dups_path=str(tmp_path / sub / "dups"),
            compact_every=0, n_buckets=4, **kw)
        nd.process_batch(spark.createDataFrame(
            [(1, BASE), (2, DISTINCT)], "doc_id long, text string"), 0)
        nd.compact(spark, upto_batch_id=1)
        nd.process_batch(spark.createDataFrame(
            [(3, NEAR), (4, BASE), (5, "too short")],
            "doc_id long, text string"), 1)
        return nd

    nd_scaled = run("scaled", target_bucket_bytes=1, max_buckets=32)
    nd_floor = run("floor")
    meta = json.load(open(os.path.join(
        nd_scaled.bands_path, "base", "segment=1", "_meta.json")))
    assert meta["n_buckets"] == 32      # the rescale really happened
    scaled = sorted((r.new_id, r.dup_of, round(r.jaccard, 9))
                    for r in nd_scaled.read_dups(spark).collect())
    floor = sorted((r.new_id, r.dup_of, round(r.jaccard, 9))
                   for r in nd_floor.read_dups(spark).collect())
    assert scaled == floor and scaled
    assert scaled[0] == (3, 1, scaled[0][2])    # near dup found
    assert (4, 1, 1.0) in scaled                # exact dup found


def test_collect_cap_path_matches(spark, tmp_path):
    """Batches over hash_collect_cap take the fully distributed exact
    stage (window-owner + anti-join, no driver-side per-row dicts) —
    its output and its index growth must equal the driver-dict
    path's, including exact-copies-not-indexed."""
    def run(sub, cap):
        nd = StreamingNearDup(
            bands_path=str(tmp_path / sub / "bands"),
            shingles_path=str(tmp_path / sub / "shingles"),
            dups_path=str(tmp_path / sub / "dups"),
            hash_collect_cap=cap)
        nd.process_batch(spark.createDataFrame(
            [(1, BASE), (2, DISTINCT)], "doc_id long, text string"), 0)
        nd.process_batch(spark.createDataFrame(
            [(3, BASE), (4, BASE), (5, NEAR), (6, "too short"),
             (7, DISTINCT + " tail marker")],
            "doc_id long, text string"), 1)
        # an all-exact-dup batch exercises the empty-remainder branch
        nd.process_batch(spark.createDataFrame(
            [(8, BASE), (9, DISTINCT)], "doc_id long, text string"), 2)
        dups = sorted((r.new_id, r.dup_of, round(r.jaccard, 9))
                      for r in nd.read_dups(spark).collect())
        hashes = sorted(r.doc_id
                        for r in nd.read_hashes(spark).collect())
        bands = sorted(r.doc_id for r in nd.read_bands(spark)
                       .select("doc_id").distinct().collect())
        return dups, hashes, bands

    distributed = run("dist", cap=1)      # every batch over the cap
    driver = run("drv", cap=50_000)       # the dict path
    assert distributed == driver
    dups, hashes, _ = driver
    assert (3, 1, 1.0) in dups and (4, 1, 1.0) in dups
    assert (8, 1, 1.0) in dups and (9, 2, 1.0) in dups
    got = {n for n, _, _ in dups}
    # 5 near-dups 1 (one token changed); 7 near-dups 2 (two appended
    # tokens, jaccard ~0.87); 3/4/8/9 are exact copies
    assert got == {3, 4, 5, 7, 8, 9}
    # exact copies are never indexed: hashes hold novel content only
    # (6 is short but exact-novel, so its hash IS recorded)
    assert hashes == [1, 2, 5, 6, 7]


def test_carry_pick_properties():
    """Pure-function properties of the carry-merge selection (r12):
    always picks >=2 segments (so every merge strictly reduces the
    count and the over-budget loop terminates); picks exactly the
    size-ordered prefix closed under 'next <= running sum'; never
    drags in a segment that out-sizes everything smaller combined."""
    from hypothesis import given, strategies as st

    from currency_market_pulse_spark.streaming.neardup_stream import (
        _carry_pick,
    )

    @given(st.lists(st.integers(min_value=0, max_value=10**12),
                    min_size=2, max_size=64))
    def prop(sizes):
        picked = _carry_pick(sizes)
        assert 2 <= len(picked) <= len(sizes)
        assert len(set(picked)) == len(picked)
        by_size = sorted(range(len(sizes)),
                         key=lambda i: (sizes[i], i))
        # the selection is a prefix of the size order
        assert picked == by_size[:len(picked)]
        # closure: everything just past the prefix was too big
        if len(picked) < len(sizes):
            nxt = by_size[len(picked)]
            assert sizes[nxt] > sum(sizes[i] for i in picked)
        # dominance: a segment larger than the sum of ALL smaller
        # ones is never picked (unless it is one of the two smallest)
        for i in by_size[2:]:
            smaller = sum(sizes[j] for j in by_size
                          if (sizes[j], j) < (sizes[i], i))
            if sizes[i] > smaller:
                assert i not in picked

    prop()


def test_max_segments_validation():
    """ADVICE r12: max_segments < 1 would make the tier loop rewrite a
    lone segment forever (a 1-segment carry pick never reduces the
    count) — the constructor rejects it up front."""
    import pytest

    from currency_market_pulse_spark.streaming.neardup_stream import (
        StreamingNearDup,
    )

    for bad in (0, -1):
        with pytest.raises(ValueError, match="max_segments"):
            StreamingNearDup(bands_path="x", shingles_path="y",
                             dups_path="z", max_segments=bad)
    StreamingNearDup(bands_path="x", shingles_path="y",
                     dups_path="z", max_segments=1)  # boundary ok


def test_recovery_and_probe_independent_of_listing_order(
        spark, tmp_path, monkeypatch):
    """VERDICT r12 directive 2: the index store's driver-side protocol
    (tail/segment discovery, bucket-count reads, crash recovery) must
    never depend on the ORDER a directory listing returns — POSIX
    leaves readdir order unspecified and object-store listings differ
    again.  Run an identical ingest (minor folds, tier merges, an
    injected mid-compaction crash, a post-recovery probe) with
    os.listdir and os.walk returning entries REVERSED, and require
    bit-identical dup logs and standing index contents."""
    import json as _json
    import os

    real_listdir, real_walk = os.listdir, os.walk

    def scenario(tag, reverse):
        if reverse:
            monkeypatch.setattr(
                os, "listdir",
                lambda p=".": list(reversed(real_listdir(p))))
            monkeypatch.setattr(
                os, "walk",
                lambda *a, **k: reversed(list(real_walk(*a, **k))))
        else:
            monkeypatch.setattr(os, "listdir", real_listdir)
            monkeypatch.setattr(os, "walk", real_walk)
        nd = StreamingNearDup(
            bands_path=str(tmp_path / f"{tag}_bands"),
            shingles_path=str(tmp_path / f"{tag}_shingles"),
            dups_path=str(tmp_path / f"{tag}_dups"),
            compact_every=2, max_segments=2, n_buckets=4)
        def novel(base_id, salt, n=2):
            # mutually-distinct shingleable docs at disjoint id ranges
            return [(base_id + i,
                     " ".join(f"w{salt}{i}x{j}k{i * 31 + j * 7}"
                              for j in range(20)))
                    for i in range(n)]

        batches = {0: [(1, BASE)], 1: [(2, DISTINCT)],
                   2: novel(10, "a"), 3: [(30, NEAR)],
                   4: novel(40, "b"), 5: [(50, BASE)],
                   6: novel(60, "c")}
        _run_batches(nd, spark, batches)
        # injected crash: pre-swap state (manifest + tmp) on bands
        root = nd.bands_path
        os.makedirs(os.path.join(root, "_compacting_segment"),
                    exist_ok=True)
        with open(os.path.join(root, "_compaction_manifest"),
                  "w") as f:
            _json.dump({"segment": 99,
                        "consumed": ["tail/batch_id=6"]}, f)
        # recovery runs at the top of this batch; then a probe that
        # must see every standing row exactly once
        nd.process_batch(spark.createDataFrame(
            [(70, NEAR.replace("dusk", "noon"))],
            "doc_id long, text string"), 7)
        return (
            sorted((r.new_id, r.dup_of, round(r.jaccard, 6))
                   for r in nd.read_dups(spark).collect()),
            sorted(map(tuple, nd.read_bands(spark).collect())),
            sorted(map(tuple, nd.read_hashes(spark).collect())),
            nd.read_shingles(spark).count(),
        )

    normal = scenario("fwd", reverse=False)
    reversed_ = scenario("rev", reverse=True)
    monkeypatch.setattr(os, "listdir", real_listdir)
    monkeypatch.setattr(os, "walk", real_walk)
    assert normal == reversed_
    # sanity: the scenario exercised what it claims (dups were found,
    # exact copy 50 flagged against 1, near-dups 30 and 70 flagged)
    flagged = {n for n, _, _ in normal[0]}
    assert {30, 50, 70} <= flagged


def test_sharded_index_equals_unsharded(spark, tmp_path):
    """shards=S is dup-for-dup and index-content equal to shards=1
    (VERDICT r14 directive 3): sharding is by BAND HASH, so an LSH
    collision pair always co-locates in its band's shard — candidate
    recall, the verify jaccards, and the rank are all identical.
    Scenario exercises cross-batch near-dups, exact copies (global
    hash relation), within-batch dups, and compaction + a tier merge
    inside the run — under S=1, 2 and 3."""
    base_batches = {i: [(i * 10, t)] for i, (_, t) in
                    enumerate(_corpus(6))}
    base_batches[2] = [(25, BASE)]
    base_batches[6] = [(61, NEAR), (62, DISTINCT)]
    base_batches[7] = [(71, base_batches[3][0][1]),     # exact copy
                       (72, NEAR.replace("dawn", "noon")),
                       (73, NEAR.replace("dawn", "noon"))]  # in-batch

    def run(tag, shards):
        nd = StreamingNearDup(
            bands_path=str(tmp_path / f"{tag}_bands"),
            shingles_path=str(tmp_path / f"{tag}_shingles"),
            dups_path=str(tmp_path / f"{tag}_dups"),
            compact_every=3, max_segments=2, n_buckets=4,
            shards=shards)
        _run_batches(nd, spark, base_batches)
        return nd

    nd1 = run("s1", 1)
    ref_dups = _dup_set(nd1, spark)
    ref_bands = sorted(map(tuple, nd1.read_bands(spark).collect()))
    ref_hashes = sorted(map(tuple, nd1.read_hashes(spark).collect()))
    ref_sh_docs = sorted(
        r.doc_id for r in
        nd1.read_shingles(spark).select("doc_id").distinct().collect())
    assert ref_dups, "scenario must flag dups"

    for s in (2, 3):
        nd = run(f"s{s}", s)
        assert _dup_set(nd, spark) == ref_dups, f"shards={s}"
        # band rows land in exactly one shard -> union == unsharded
        assert sorted(map(tuple,
                          nd.read_bands(spark).collect())) == ref_bands
        assert sorted(map(tuple,
                          nd.read_hashes(spark).collect())) == ref_hashes
        # shingles REPLICATE to every shard a doc's bands touch; the
        # distinct doc set (and per-doc content) matches
        assert sorted(
            r.doc_id for r in nd.read_shingles(spark)
            .select("doc_id").distinct().collect()) == ref_sh_docs
        # dedup recovers the unsharded relation exactly
        assert (nd.read_shingles(spark)
                .dropDuplicates(["doc_id", "sh"]).count()
                == nd1.read_shingles(spark).count())


def test_sharded_restart_continues(spark, tmp_path):
    """A sharded index survives a handler restart (per-root recovery
    covers every shard root) and keeps flagging against pre-restart
    standing content."""
    nd = StreamingNearDup(
        bands_path=str(tmp_path / "r_bands"),
        shingles_path=str(tmp_path / "r_shingles"),
        dups_path=str(tmp_path / "r_dups"),
        compact_every=2, n_buckets=4, shards=2)
    _run_batches(nd, spark, {0: [(1, BASE)],
                             1: [(2, DISTINCT)],
                             2: _corpus(2, salt="z")})
    # fresh handler on the same roots = restart
    nd2 = StreamingNearDup(
        bands_path=str(tmp_path / "r_bands"),
        shingles_path=str(tmp_path / "r_shingles"),
        dups_path=str(tmp_path / "r_dups"),
        compact_every=2, n_buckets=4, shards=2)
    _run_batches(nd2, spark, {3: [(9, NEAR)]})
    dups = {r.new_id: r.dup_of
            for r in nd2.read_dups(spark).collect()}
    assert dups.get(9) == 1


def test_sharded_index_with_marker_store(spark, tmp_path):
    """Sharding composes with the object-store marker protocol: every
    shard root is independently claimed/stamped and publishes through
    conditional-PUT commit markers; dup log equals the rename-store
    sharded run."""
    import os as _os

    from currency_market_pulse_spark.streaming.segment_store import (
        MarkerSegmentStore, RenameSegmentStore,
    )

    batches = {0: [(1, BASE)], 1: [(2, DISTINCT)],
               2: _corpus(2, salt="m"), 3: [(9, NEAR)]}

    def run(tag, store):
        nd = StreamingNearDup(
            bands_path=str(tmp_path / f"{tag}_bands"),
            shingles_path=str(tmp_path / f"{tag}_shingles"),
            dups_path=str(tmp_path / f"{tag}_dups"),
            compact_every=2, n_buckets=4, shards=2,
            segment_store=store)
        _run_batches(nd, spark, batches)
        return nd

    nd_m = run("mk", MarkerSegmentStore())
    nd_r = run("rn", RenameSegmentStore())
    assert _dup_set(nd_m, spark) == _dup_set(nd_r, spark)
    assert (sorted(map(tuple, nd_m.read_bands(spark).collect()))
            == sorted(map(tuple, nd_r.read_bands(spark).collect())))
    # every shard root is stamped with the marker protocol and its
    # committed segments carry markers
    for root in nd_m._band_roots() + nd_m._shingle_roots():
        with open(_os.path.join(root, "_store_protocol")) as f:
            assert f.read().strip() == "marker"
        for _i, p in MarkerSegmentStore().committed(root):
            assert _os.path.exists(_os.path.join(p, "_committed"))


def test_sharded_overcap_degrades_to_distributed(spark, tmp_path):
    """ADVICE r15 low: shards>1 with a micro-batch over
    hash_collect_cap used to raise inside foreachBatch — the engine
    replays the batch on restart and re-raises forever, so one
    transient burst permanently wedged the stream.  The distributed
    exact stage now probes serially per shard root and routes its
    tail writes by band hash (same layout and seed as the dict
    path), so the burst degrades to a slower batch whose dup log and
    index content are EQUAL to the unsharded dict-path reference.
    cap=1 also interleaves the two paths on the same roots (1-row
    batches stay on the dict path; multi-row batches go distributed)."""
    base_batches = {i: [(i * 10, t)] for i, (_, t) in
                    enumerate(_corpus(6))}
    base_batches[2] = [(25, BASE)]
    base_batches[6] = [(61, NEAR), (62, DISTINCT)]
    base_batches[7] = [(71, base_batches[3][0][1]),     # exact copy
                       (72, NEAR.replace("dawn", "noon")),
                       (73, NEAR.replace("dawn", "noon"))]  # in-batch

    def run(tag, shards, cap):
        nd = StreamingNearDup(
            bands_path=str(tmp_path / f"{tag}_bands"),
            shingles_path=str(tmp_path / f"{tag}_shingles"),
            dups_path=str(tmp_path / f"{tag}_dups"),
            compact_every=3, max_segments=2, n_buckets=4,
            shards=shards, hash_collect_cap=cap)
        _run_batches(nd, spark, base_batches)
        return nd

    ref = run("ocref", 1, 50_000)     # unsharded dict path
    over = run("ocov", 2, 1)          # sharded, bursts over the cap
    assert _dup_set(over, spark) == _dup_set(ref, spark)
    assert (sorted(map(tuple, over.read_bands(spark).collect()))
            == sorted(map(tuple, ref.read_bands(spark).collect())))
    assert (sorted(map(tuple, over.read_hashes(spark).collect()))
            == sorted(map(tuple, ref.read_hashes(spark).collect())))
    # shingles replicate per touched shard; dedup recovers shards=1
    assert (over.read_shingles(spark)
            .dropDuplicates(["doc_id", "sh"]).count()
            == ref.read_shingles(spark).count())
    # sanity: the scenario found dups at all
    assert {71, 72, 73} <= {n for n, _, _ in _dup_set(ref, spark)}


def test_volume_guard_routes_long_docs_to_distributed(spark, tmp_path):
    """VERDICT r15 "what's wrong 2": the dict path collects the
    batch's SHINGLE relation driver-side, which scales with
    characters — a few maximal-length docs under the ROW cap could
    still put gigabytes on the driver.  Batches whose summed text
    length exceeds collect_volume_chars now take the distributed
    path (the proxy rides along on the first collect — zero extra
    jobs), with identical output."""
    LONG = " ".join(BASE for _ in range(3))

    def run(tag, vol_cap):
        nd = StreamingNearDup(
            bands_path=str(tmp_path / f"{tag}_bands"),
            shingles_path=str(tmp_path / f"{tag}_shingles"),
            dups_path=str(tmp_path / f"{tag}_dups"),
            n_buckets=4, collect_volume_chars=vol_cap)
        nd.process_batch(spark.createDataFrame(
            [(1, LONG), (2, DISTINCT)], "doc_id long, text string"), 0)
        nd.process_batch(spark.createDataFrame(
            [(3, LONG.replace("dawn", "dusk")), (4, LONG)],
            "doc_id long, text string"), 1)
        return nd

    guarded = run("vg", 10)          # every batch over 10 chars
    free = run("vf", 256 << 20)      # dict path throughout
    # route detection via the stage marks: only the distributed
    # stage records bands_touched_collect; only the dict path
    # records bands_collect
    assert "bands_touched_collect" in guarded.last_stage_s
    assert "bands_collect" not in guarded.last_stage_s
    assert "bands_collect" in free.last_stage_s
    assert _dup_set(guarded, spark) == _dup_set(free, spark)
    dups = {n: d for n, d, _ in _dup_set(free, spark)}
    assert dups == {3: 1, 4: 1}      # near-dup + exact copy found
