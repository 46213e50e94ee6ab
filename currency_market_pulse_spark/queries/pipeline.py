"""End-to-end training-data pipeline as ONE composed query — the
capstone proving the §2.6 operators compose: quality gate -> exact
dedup -> train split -> sequence packing -> per-shard stats, with a
single DuckDB oracle replaying every stage.

Stage order matters and mirrors production pipelines: cheap row-local
filters first (quality), then the corpus-wide shuffle ops (dedup),
then the zero-shuffle split, then packing within shards.  Every stage
is the library operator, not a re-implementation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from currency_market_pulse_spark.operators import packing as P
from currency_market_pulse_spark.operators import sampling as S
from currency_market_pulse_spark.queries.registry import extra_query
from currency_market_pulse_spark.queries.sampling import (
    SPLIT_WEIGHTS, _frac_sql, _split_case_sql,
)
from currency_market_pulse_spark.sources.catalog import load_table

PIPE_BUDGET = 2048


def _gopher_keep_ctes() -> str:
    """CTE pair (ptoks, us) + the WHERE body of the full Gopher keep
    decision (operators/textops.py gopher_flags — all five integer
    rules), shared with the documents_gopher_filter oracle."""
    from currency_market_pulse_spark.functions.text import STOPWORDS
    from currency_market_pulse_spark.operators.textops import (
        GOPHER_MAX_TOKENS, GOPHER_MIN_TOKENS,
    )

    stop = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"
    return f"""
ptoks AS (SELECT doc_id, text, source, n_chars,
                 string_split_regex(lower(text), '\\s+') AS t
          FROM documents),
pus AS (SELECT doc_id, max(c) AS top_uni
        FROM (SELECT doc_id, g, count(*) AS c
              FROM (SELECT doc_id, unnest(t) AS g FROM ptoks) u
              GROUP BY 1, 2) uc GROUP BY 1),
quality AS (
  SELECT tk.doc_id, tk.text, tk.source, tk.n_chars
  FROM ptoks tk LEFT JOIN pus USING (doc_id)
  WHERE len(tk.t) BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS}
    AND list_aggregate(list_transform(tk.t, x -> length(x)), 'sum')
        BETWEEN 2 * len(tk.t) AND 12 * len(tk.t)
    AND len(list_filter(tk.t, x -> list_contains({stop}, x))) >= 2
    AND 10 * length(regexp_replace(lower(tk.text), '[a-z0-9\\s]', '', 'g'))
        <= length(tk.text)
    AND 4 * coalesce(pus.top_uni, 0) <= len(tk.t))"""


_PIPELINE_ORACLE = f"""
WITH {_gopher_keep_ctes()},
deduped AS (
  SELECT doc_id, source, n_chars FROM (
    SELECT doc_id, source, n_chars,
           row_number() OVER (PARTITION BY md5(text)
                              ORDER BY doc_id) AS rn
    FROM quality) t
  WHERE rn = 1),
train AS (
  SELECT doc_id, source, n_chars FROM (
    SELECT doc_id, source, n_chars,
           {_split_case_sql().replace('frac',
                                      _frac_sql('split', 'doc_id'))} AS split
    FROM deduped) s
  WHERE split = 'train'),
packed AS (
  SELECT source, n_chars,
         CAST(floor((cum - n_chars) / {PIPE_BUDGET}) AS BIGINT) AS pack_id
  FROM (SELECT source, n_chars,
               sum(n_chars) OVER (PARTITION BY source
                                  ORDER BY doc_id) AS cum
        FROM train) c)
SELECT source,
       count(*) AS n_docs,
       CAST(max(pack_id) + 1 AS BIGINT) AS n_packs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM packed GROUP BY source ORDER BY source
"""


@extra_query("documents_pipeline_stats", oracle=_PIPELINE_ORACLE)
def documents_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline: full Gopher-rule quality gate (r6 —
    operators/textops.py gopher_filter, all five integer rules, not
    just the token floor) -> exact dedup (keep lowest doc_id per
    md5(text)) -> 90/5/5 hash split (train kept) -> chunk packing at
    {PIPE_BUDGET} chars per shard -> per-shard doc/pack/char
    totals."""
    from currency_market_pulse_spark.operators.textops import gopher_filter

    docs = load_table(spark, sf_dir, "documents")
    quality = gopher_filter(docs)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (quality.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).drop("_rn"))
    train = (S.hash_split(deduped, "doc_id", SPLIT_WEIGHTS)
             .filter(F.col("split") == "train"))
    packed = P.chunk_pack(train, "doc_id", "n_chars", PIPE_BUDGET, "source")
    return (packed.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.max("pack_id") + 1).alias("n_packs"),
                 F.sum("n_chars").alias("sum_chars"))
            .orderBy("source"))
