"""Multimodal pipeline stages (operators/multimodal.py): decode /
resize / frame-sample / feature-extract.  Kernels are deterministic
stubs (no codecs in this container); what these tests pin is the REAL
part — schemas, Arrow batch shapes (1->1, 1->N), binary columns, and
the handoff into the embedding operators."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from currency_market_pulse_spark.operators import multimodal as M


def _docs(spark):
    return spark.createDataFrame([
        Row(doc_id=i, text=t) for i, t in
        enumerate(["alpha beta", "gamma delta epsilon", "zeta"])])


def test_resize_emits_requested_dims_and_deterministic_bytes(spark):
    out = M.resize_images(M.with_binary_payload(_docs(spark)), 224, 224)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 3
    assert all(r.width == 224 and r.height == 224 for r in rows.values())
    expect = hashlib.md5(b"alpha beta" + b"|224x224").digest()
    assert bytes(rows[0].payload) == expect
    # re-running yields identical bytes (pure function of payload+dims)
    again = {r.doc_id: bytes(r.payload) for r in M.resize_images(
        M.with_binary_payload(_docs(spark)), 224, 224).collect()}
    assert again == {k: bytes(v.payload) for k, v in rows.items()}


def test_frame_sample_is_one_to_n(spark):
    out = M.sample_frames(M.with_binary_payload(_docs(spark))).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, text in enumerate(["alpha beta", "gamma delta epsilon", "zeta"]):
        b = text.encode()
        h64 = int(hashlib.md5(b).hexdigest()[:15], 16)
        frames = sorted(by_doc[i], key=lambda r: r.frame_idx)
        assert len(frames) == h64 % M.MAX_STUB_FRAMES + 1
        assert [f.frame_idx for f in frames] == list(range(len(frames)))
        assert [f.ts_ms for f in frames] == [
            k * M.FRAME_INTERVAL_MS for k in range(len(frames))]
        assert frames[0].frame_md5 == hashlib.md5(b + b"|frame|0").hexdigest()


def test_extract_features_feeds_embedding_dedup(spark):
    """The feature vectors are valid array<float> input for the
    embedding near-dup operator — the multimodal -> dedup loop."""
    from currency_market_pulse_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    dup_docs = spark.createDataFrame([
        Row(doc_id=0, text="same bytes"),
        Row(doc_id=1, text="same bytes"),     # identical payload
        Row(doc_id=2, text="other bytes"),
    ])
    feats = M.extract_features(M.with_binary_payload(dup_docs), dim=8)
    rows = {r.doc_id: r.embedding for r in feats.collect()}
    assert rows[0] == rows[1] != rows[2]
    assert all(-1.0 <= x < 1.0 for v in rows.values() for x in v)
    pairs = embedding_near_dup_pairs(
        feats, threshold=0.999, id_col="doc_id", vec_col="embedding")
    assert {(r.id_a, r.id_b) for r in pairs.collect()} == {(0, 1)}


def test_phash_neardup_flags_planted_duplicate(spark):
    """A payload differing by a few bytes from another must land
    within hamming<=3 of it (perceptual property of the byte-pooled
    aHash); an unrelated payload must not pair with either.  Also pins
    banding completeness: pair set equals brute-force hamming<=3."""
    from pyspark.sql import Row, functions as F

    from currency_market_pulse_spark.operators.multimodal import (
        ahash_signatures, phash_neardup_pairs, with_binary_payload,
    )

    base = ("the quick brown fox jumps over the lazy dog while rivers "
            "flow past old stone bridges at dawn and birds circle") * 3
    near = base.replace("dawn", "dusk")          # local byte edit
    other = ("zzzz completely different payload AAAA 0101 ~~~ !!! "
             "unrelated bytes with another distribution entirely") * 4
    docs = spark.createDataFrame([
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=near),
        Row(doc_id=3, text=other),
    ])
    wp = with_binary_payload(docs)
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in phash_neardup_pairs(wp, k=3).collect()}
    assert (1, 2) in pairs
    assert all({3} - {a, b} for (a, b) in pairs)
    # banding completeness vs brute force over the signatures
    sigs = {r.doc_id: r.ahash for r in ahash_signatures(wp).collect()}
    brute = {(a, b) for a in sigs for b in sigs if a < b
             and bin(sigs[a] ^ sigs[b]).count("1") <= 3}
    assert set(pairs) == brute


def test_video_neardup_flags_perturbed_clip(spark):
    """A clip whose payload differs by one token shares most frame
    signatures within hamming<=3; an unrelated clip pairs with
    neither.  Fractions are per-side frame-match ratios."""
    from pyspark.sql import Row

    from currency_market_pulse_spark.operators.multimodal import (
        frame_ahash_signatures, video_neardup_pairs, with_binary_payload,
    )

    base = ("the quick brown fox jumps over the lazy dog while rivers "
            "flow past old stone bridges at dawn and birds circle") * 4
    rows = [Row(doc_id=1, text=base),
            Row(doc_id=2, text=base.replace("dawn", "dusk")),
            Row(doc_id=3, text="utterly different ~~ bytes !!! 0101 " * 20)]
    wp = with_binary_payload(spark.createDataFrame(rows))
    out = {(r.id_a, r.id_b): r
           for r in video_neardup_pairs(wp, k=3, min_frac=0.5).collect()}
    assert (1, 2) in out
    assert all(3 not in p for p in out)
    r = out[(1, 2)]
    n1 = frame_ahash_signatures(wp).filter("doc_id = 1").count()
    assert 0 < r.n_match_a <= n1 and r.frac_a >= 0.5
