"""Text-analysis queries over ``documents`` (operators/textops.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from currency_market_pulse_spark.functions.text import STOPWORDS
from currency_market_pulse_spark.operators import textops as X
from currency_market_pulse_spark.queries.registry import query
from currency_market_pulse_spark.sources.catalog import load_table

_TOKS = (r"toks AS (SELECT doc_id, text, lang, "
         r"string_split_regex(lower(text), '\s+') AS t FROM documents)")


def _stoplist(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


@query(
    "text_quality",
    oracle=f"""
WITH {_TOKS}
SELECT doc_id,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_distinct_tokens,
       round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS type_token_ratio,
       round(CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE)
             / len(t), 6) AS avg_token_len,
       round(CAST(len(list_filter(t, x -> list_contains({_stoplist('en')}, x)))
             AS DOUBLE) / len(t), 6) AS stopword_ratio,
       length(text) AS n_chars_measured
FROM toks
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features: token counts, type-token ratio, mean
    token length, stopword ratio."""
    return X.quality_features(load_table(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    langs = list(STOPWORDS)
    hits = ", ".join(
        f"len(list_filter(t, x -> list_contains({_stoplist(lg)}, x))) AS hits_{lg}"
        for lg in langs)
    best = "greatest(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    pred = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN hits_{lg} = {best} THEN '{lg}'" for lg in langs) + " END"
    return f"""
WITH {_TOKS},
h AS (SELECT doc_id, lang, {hits} FROM toks)
SELECT doc_id, {', '.join(f'hits_{lg}' for lg in langs)},
       {pred} AS predicted_lang,
       lang AS labeled_lang,
       ({pred}) = lang AS is_match
FROM h
"""


@query("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit n-gram language ID (argmax over per-language hit
    counts, deterministic tie order)."""
    return X.langid_scores(load_table(spark, sf_dir, "documents"))


@query(
    "text_token_counts",
    oracle=rf"""
SELECT doc_id,
       len(string_split_regex(lower(text), '\s+')) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{X.BPE_REGEX}')) AS n_bpe_tokens,
       length(text) AS n_chars_measured
FROM documents
""",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting."""
    return X.token_counts(load_table(spark, sf_dir, "documents"))


@query(
    "text_fingerprints",
    oracle=f"""
WITH {_TOKS}
SELECT doc_id,
       md5(text) AS content_md5,
       list_aggregate(
         list_transform(
           list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
           s -> md5('fp|' || s)), 'min') AS shingle_fingerprint
FROM toks
""",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact md5 + min-shingle-hash (winnowing
    style)."""
    return X.fingerprints(load_table(spark, sf_dir, "documents"))
