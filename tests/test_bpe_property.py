"""Property-based differential for the BPE encode fold: the Spark
replace-fold over the delimited symbol representation must equal a
direct Python reference implementation of greedy left-to-right merge
application for ANY token content and ANY merge table."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import Row


def _ref_apply(tok: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference BPE application: start from characters; apply each
    merge in rank order, scanning left to right without rescanning
    replaced output (Sennrich et al. 2016 training-time semantics)."""
    syms = list(tok)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _ref_counts(text: str, n_merges: int) -> dict[str, tuple[int, int]]:
    """(n_chars, n_symbols) per doc for the top-n_merges pair table
    derived exactly as bpe_pair_counts does (single pass, count desc,
    pair asc)."""
    toks = text.lower().split()
    pairs: dict[str, int] = {}
    for t in toks:
        for i in range(len(t) - 1):
            pairs[t[i:i + 2]] = pairs.get(t[i:i + 2], 0) + 1
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    merges = [(p[0], p[1]) for p, _ in ranked[:n_merges]]
    n_chars = sum(len(t) for t in toks)
    n_syms = sum(len(_ref_apply(t, merges)) for t in toks)
    return n_chars, n_syms


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.text(alphabet="abc", min_size=1, max_size=8), min_size=1,
    max_size=6).map(" ".join))
def test_bpe_encode_matches_reference(spark, text):
    from currency_market_pulse_spark.operators.textops import (
        bpe_encode_stats,
    )

    docs = spark.createDataFrame([Row(doc_id=1, text=text)])
    row = bpe_encode_stats(docs, n_merges=3).collect()[0]
    n_chars, n_syms = _ref_counts(text, 3)
    assert (row.n_chars, row.n_bpe_symbols) == (n_chars, n_syms)
