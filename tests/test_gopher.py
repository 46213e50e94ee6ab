"""Gopher-rule filter: each rule trips independently on planted docs,
and the kept corpus equals the flags' keep set.  Also pins the BPE
encode operator's greedy-left merge semantics on planted tokens."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from currency_market_pulse_spark.operators.textops import (
    gopher_filter, gopher_flags,
)


def _docs(spark):
    ok = ("the cat sat of a mat and the dog ran to a tree of green "
          "leaves and the bird flew to a nest of twigs and the fox "
          "slept near a den of stones while the owl watched")  # 39 toks
    rows = [
        Row(doc_id=1, text=ok),
        Row(doc_id=2, text="too short of the a to"),              # tokens
        Row(doc_id=3, text=ok.replace("cat", "x" * 600)),         # word len
        Row(doc_id=4, text=" ".join(["word"] * 40)),              # stopwords
        Row(doc_id=5, text=ok + " " + "@#$%^&*!~" * 30),          # symbols
        Row(doc_id=6, text=ok + " " + " ".join(["the"] * 60)),    # repetition
    ]
    return spark.createDataFrame(rows)


def test_each_rule_trips_independently(spark):
    fl = {r.doc_id: r for r in gopher_flags(_docs(spark)).collect()}
    assert fl[1].keep
    assert not fl[2].pass_tokens
    assert not fl[3].pass_word_len
    assert not fl[4].pass_stopwords
    assert not fl[5].pass_symbols
    assert not fl[6].pass_repetition
    kept = {r.doc_id for r in gopher_filter(_docs(spark)).collect()}
    assert kept == {d for d, r in fl.items() if r.keep}


def test_bpe_encode_greedy_left_merges(spark):
    """Planted corpus where the top merge is unambiguous: 'ababab'
    repeated means ('a','b') dominates pair counts; greedy-left encode
    must merge non-overlapping left-to-right ('abab' -> [ab, ab],
    'aaa' -> [aa, a] when ('a','a') ranks)."""
    from currency_market_pulse_spark.operators.textops import (
        bpe_encode_stats,
    )

    docs = spark.createDataFrame([
        Row(doc_id=1, text="abab abab abab"),
        Row(doc_id=2, text="aaab"),
    ])
    out = {r.doc_id: r for r in
           bpe_encode_stats(docs, n_merges=1).collect()}
    # merge table = top-1 pair = 'ab' (6 occurrences in doc1 + 1 in
    # doc2 vs 'aa' 2, 'ba' 3) -> doc1 tokens each become [ab, ab]
    assert out[1].n_bpe_symbols == 6          # 3 tokens x 2 symbols
    assert out[1].n_chars == 12
    assert out[1].compression_ratio == 2.0
    # doc2 'aaab' -> a a ab (only the final pair merges)
    assert out[2].n_bpe_symbols == 3
