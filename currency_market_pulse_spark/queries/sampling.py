"""Deterministic sampling / dataset-split queries (operators/sampling.py).

Library tier (@extra_query): the driver-visible registry is capped at
50; these are held to the same DuckDB-differential standard by
tests/test_extra_queries.py.

The oracles reproduce the identical md5-prefix hash math
(``('0x' || substr(md5(seed || '|' || id), 1, 15))::BIGINT``), the same
IEEE-double division by 2^60, and — for ``hash_split`` — the exact
cumulative-threshold float literals via ``split_thresholds`` (Python
``repr`` round-trips the double bit-for-bit into DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from currency_market_pulse_spark.operators import sampling as S
from currency_market_pulse_spark.queries.registry import extra_query, query
from currency_market_pulse_spark.sources.catalog import load_table

#: Flagship 90/5/5 split used by the split query and its oracle.
SPLIT_WEIGHTS = {"train": 0.90, "val": 0.05, "test": 0.05}

#: Per-language sampling rates: downsample dominant en, keep all fr.
STRATA_FRACTIONS = {"en": 0.25, "de": 0.5, "fr": 1.0}

#: Per-user event cap for the balancing query.
USER_CAP = 3

#: Global char budget for the prefix sampler (≈⅔ of sf0.01's corpus).
CHAR_BUDGET = 100_000

#: Per-language char budget for the mixture query (partial in every
#: language at sf0.01: smallest language holds ~19.5k chars).
LANG_BUDGET = 10_000


def _hash_long_sql(seed: str, id_expr: str) -> str:
    return (f"CAST(('0x' || substr(md5('{seed}|' || "
            f"CAST({id_expr} AS VARCHAR)), 1, 15)) AS BIGINT)")


def _frac_sql(seed: str, id_expr: str) -> str:
    return f"({_hash_long_sql(seed, id_expr)} / {float(S.HASH_SPACE)!r})"


def _split_case_sql() -> str:
    parts = []
    for name, ub in S.split_thresholds(SPLIT_WEIGHTS)[:-1]:
        parts.append(f"WHEN frac < {ub!r} THEN '{name}'")
    last = list(SPLIT_WEIGHTS)[-1]
    return "CASE " + " ".join(parts) + f" ELSE '{last}' END"


@extra_query(
    "documents_hash_split",
    oracle=f"""
WITH f AS (SELECT n_chars, {_frac_sql('split', 'doc_id')} AS frac
           FROM documents),
s AS (SELECT n_chars, {_split_case_sql()} AS split FROM f)
SELECT split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM s GROUP BY split ORDER BY split
""",
)
def documents_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by doc_id hash;
    per-split doc and char counts.  Zero-shuffle assignment (pure
    projection), one aggregate shuffle on the 3-value split key."""
    docs = load_table(spark, sf_dir, "documents")
    return (S.hash_split(docs, "doc_id", SPLIT_WEIGHTS)
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"))
            .orderBy("split"))


#: docs per language in the held-out eval carve-out.
EVAL_K = 20


@extra_query(
    "documents_eval_sample_k",
    oracle=f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_hash_long_sql('eval', 'doc_id')}, doc_id) AS rn
  FROM documents) t
WHERE rn <= {EVAL_K} ORDER BY lang, doc_id
""",
)
def documents_eval_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-language eval carve-out (operators/sampling.py
    per_group_cap): EXACTLY {EVAL_K} docs per language, chosen by
    deterministic hash order — unlike fraction sampling, the eval-set
    SIZE is guaranteed, and a doc's membership only changes if a
    lower-hash doc enters its language (append-mostly corpora keep
    eval sets near-frozen).  One shuffle on the (tiny-cardinality)
    language key; AQE splits any skewed language."""
    from currency_market_pulse_spark.operators.sampling import (
        per_group_cap,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (per_group_cap(docs.select("doc_id", "lang"),
                          "lang", "doc_id", EVAL_K, seed="eval")
            .select("doc_id", "lang")
            .orderBy("lang", "doc_id"))


def _strata_case_sql() -> str:
    whens = " ".join(f"WHEN lang = '{k}' THEN {v!r}"
                     for k, v in STRATA_FRACTIONS.items())
    return f"CASE {whens} ELSE 0.0 END"


@extra_query(
    "documents_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_frac_sql('sample', 'doc_id')} < {_strata_case_sql()}
""",
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling (rebalance the corpus:
    25% of en, 50% of de, all of fr, drop the rest).  Zero-shuffle —
    the filter fuses into the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return (S.stratified_sample(docs, "doc_id", "lang", STRATA_FRACTIONS)
            .select("doc_id", "lang", "source"))


@extra_query(
    "events_per_user_cap",
    oracle=f"""
WITH ranked AS (
  SELECT event_id, user_id, event_type,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY {_hash_long_sql('cap', 'event_id')}, event_id
         ) AS rn
  FROM events)
SELECT event_id, user_id, event_type
FROM ranked WHERE rn <= {USER_CAP}
""",
)
def events_per_user_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset balancing: keep at most {USER_CAP} events per user,
    chosen deterministically by event-id hash.  One shuffle on
    user_id."""
    ev = load_table(spark, sf_dir, "events")
    return (S.per_group_cap(ev, "user_id", "event_id", USER_CAP)
            .select("event_id", "user_id", "event_type"))


#: Shard count for the global-shuffle layout query.
N_SHARDS = 16

#: Per-language epoch multipliers for the mixture up-sampling query
#: (repeat scarce languages; unlisted languages default to 1 epoch).
MIXTURE_EPOCHS = {"fr": 3, "de": 2}


def _epochs_case_sql() -> str:
    whens = " ".join(f"WHEN '{v}' THEN {n}"
                     for v, n in MIXTURE_EPOCHS.items())
    return f"CASE lang {whens} ELSE 1 END"


@extra_query(
    "documents_mixture_upsample",
    oracle=f"""
SELECT doc_id, lang, n_chars,
       CAST(unnest(generate_series(1, {_epochs_case_sql()})) AS INT)
         AS epoch
FROM documents
""",
)
def documents_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture up-sampling (operators/sampling.py upsample_epochs):
    scarce languages replicated per MIXTURE_EPOCHS with an epoch
    column distinguishing copies — the multiplicative dual of
    stratified down-sampling, zero shuffle (scan-fused explode)."""
    docs = load_table(spark, sf_dir, "documents")
    return (S.upsample_epochs(docs.select("doc_id", "lang", "n_chars"),
                              "lang", MIXTURE_EPOCHS)
            .select("doc_id", "lang", "n_chars",
                    F.col("epoch").cast("int").alias("epoch")))


@extra_query(
    "documents_train_shards",
    oracle=f"""
WITH h AS (SELECT doc_id, lang,
                  {_hash_long_sql('shard', 'doc_id')} AS h
           FROM documents)
SELECT doc_id, lang, CAST(h % {N_SHARDS} AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY h % {N_SHARDS}
                               ORDER BY h, doc_id) AS BIGINT) AS pos
FROM h ORDER BY shard, pos
""",
)
def documents_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-shuffle shard layout (operators/sampling.py
    shuffle_shards): every document assigned a shard and an in-shard
    position by portable hash — the deterministic 'write the corpus in
    random order' step, one shuffle, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    out = S.shuffle_shards(docs.select("doc_id", "lang"),
                           "doc_id", N_SHARDS)
    return (out.select("doc_id", "lang", "shard",
                       F.col("pos").cast("long").alias("pos"))
            .orderBy("shard", "pos"))


@query(
    "documents_token_budget",
    oracle=f"""
WITH r AS (
  SELECT doc_id, lang, n_chars,
         CAST(sum(n_chars) OVER (
           ORDER BY n_chars DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_chars
  FROM documents)
SELECT doc_id, lang, n_chars, cum_chars
FROM r WHERE cum_chars <= {CHAR_BUDGET}
""",
)
def documents_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampler: best documents (longest first, doc_id
    tiebreak) until the cumulative char count reaches CHAR_BUDGET.

    The oracle is the textbook single-window running sum; the Spark
    side is the DISTRIBUTED prefix sum (operators/sampling.py
    ``running_total``: range shuffle -> per-partition totals ->
    broadcast offsets) because ``sum() OVER (ORDER BY ...)`` with no
    PARTITION BY plans a ONE-TASK window — dead at 100 TB.  Integer
    weights make the decomposed sum bitwise-equal to the sequential
    one."""
    docs = load_table(spark, sf_dir, "documents")
    picked = S.budget_prefix_sample(
        docs.select("doc_id", "lang", "n_chars"),
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        "n_chars", CHAR_BUDGET, out_col="cum_chars")
    return picked.select("doc_id", "lang", "n_chars", "cum_chars")


@extra_query(
    "documents_budget_per_lang",
    oracle=f"""
WITH r AS (
  SELECT doc_id, lang, n_chars,
         CAST(sum(n_chars) OVER (
           PARTITION BY lang
           ORDER BY n_chars DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_chars
  FROM documents)
SELECT doc_id, lang, n_chars, cum_chars
FROM r WHERE cum_chars <= {LANG_BUDGET}
""",
)
def documents_budget_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture primitive: within each language keep the best
    documents until that language's budget is spent ("at most
    LANG_BUDGET chars per language").  One shuffle on lang; the window
    is PARTITIONED so plain window arithmetic is already scale-safe
    (hot languages are bounded by the budget cut itself)."""
    docs = load_table(spark, sf_dir, "documents")
    picked = S.per_group_budget(
        docs.select("doc_id", "lang", "n_chars"), "lang",
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        "n_chars", LANG_BUDGET, out_col="cum_chars")
    return picked.select("doc_id", "lang", "n_chars", "cum_chars")


#: DSIR split: docs whose hash fraction under this seed falls below the
#: threshold play the (small) TARGET corpus; the rest are the raw pool
#: being scored.  Mirrors the dedup_incremental split pattern so the
#: oracle replays the identical assignment.
DSIR_SEED = "dsirsplit"
DSIR_TARGET_FRAC = 0.1
DSIR_BUCKETS = 1024


def _dsir_oracle() -> str:
    frac = _frac_sql(DSIR_SEED, "doc_id")
    b = DSIR_BUCKETS
    return rf"""
WITH toked AS MATERIALIZED (
  SELECT doc_id, ({frac} < {DSIR_TARGET_FRAC!r}) AS is_t,
         CAST(('0x' || substr(md5('dsir|' || tok), 1, 15)) AS BIGINT)
           % {b} AS bkt
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS tok
        FROM documents WHERE text IS NOT NULL) s),
hist AS MATERIALIZED (
  SELECT bkt,
         CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
  FROM toked GROUP BY bkt),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
               CAST(sum(cr) AS BIGINT) AS tr FROM hist),
lr AS MATERIALIZED (
  -- integer-fixed per-bucket ratio (x 1e4): per-doc totals sum as
  -- order-independent integers (sf0.001 found the double-sum-order
  -- boundary) and the coarse quantum rides out the ~5e-13 JVM-vs-libm
  -- ln() divergence (sf1 found the 1e-9-quantum flip) — see
  -- operators/sampling.py dsir_logratios
  SELECT bkt,
         CAST(round((ln((ct + 1) / CAST(tt + {b} AS DOUBLE))
                     - ln((cr + 1) / CAST(tr + {b} AS DOUBLE)))
                    * 10000, 0) AS BIGINT) AS lri
  FROM hist CROSS JOIN tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(lri) / 10000.0, 6) AS log_ratio
FROM toked JOIN lr USING (bkt)
WHERE NOT is_t
GROUP BY doc_id
"""


@extra_query("documents_dsir_weights", oracle=_dsir_oracle())
def documents_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/sampling.py dsir_logratios):
    every raw-pool document scored by the hashed-unigram log importance
    ratio against a deterministic 10% target split — the data-SELECTION
    stage of a training pipeline ("pick web pages that look like the
    quality corpus"), reduced to two bucket histograms and a broadcast
    join.  Oracle replays split, hashing, smoothing and scoring."""
    docs = load_table(spark, sf_dir, "documents")
    return S.dsir_logratios(
        docs,
        S.hash_fraction(F.col("doc_id"), DSIR_SEED) < DSIR_TARGET_FRAC,
        buckets=DSIR_BUCKETS, seed="dsir")


#: Target sample size (rows) for the alpha = 0.5 temperature sampler —
#: half of sf0.01's corpus, so every language's rate lands strictly
#: inside (0, 1) and the cap branch stays inert at gate scale (the
#: cap itself is unit-tested).
ALPHA_BUDGET = 250

_ALPHA_ORACLE = f"""
WITH counts AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang),
mass AS (
  SELECT lang, n,
         CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS s
  FROM counts),
tot AS (SELECT CAST(sum(s) AS BIGINT) AS stot FROM mass),
rates AS (
  SELECT lang, n,
         least(1.0, CAST({ALPHA_BUDGET} * s AS DOUBLE)
                    / CAST(stot * n AS DOUBLE)) AS rate
  FROM mass CROSS JOIN tot),
flagged AS (
  SELECT d.lang, d.doc_id, r.rate,
         ({_frac_sql("alpha", "d.doc_id")}) < r.rate AS keep
  FROM documents d JOIN rates r USING (lang))
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(max(rate), 6) AS sample_rate,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected,
       CAST(sum(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT)
         AS selected_id_sum
FROM flagged
GROUP BY lang
"""


@extra_query("documents_alpha_sampling", oracle=_ALPHA_ORACLE)
def documents_alpha_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha = 0.5) language rebalancing
    (operators/sampling.py temperature_sample): per-language keep
    rates proportional to sqrt(n)/n, deterministic hash Bernoulli per
    doc.  The per-language summary proves the exact selected SET, not
    just its size: selected_id_sum is an order-independent integer
    checksum of the chosen doc_ids, so one flipped selection anywhere
    fails the gate.  Head language (en) is damped hardest, tail (fr)
    least — the XLM mixing rule."""
    flagged = S.temperature_sample(
        load_table(spark, sf_dir, "documents"),
        "lang", "doc_id", budget=ALPHA_BUDGET, seed="alpha")
    return (flagged.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.max("rate"), 6).alias("sample_rate"),
                 F.sum(F.col("keep").cast("long")).alias("n_selected"),
                 F.sum(F.when(F.col("keep"), F.col("doc_id"))
                       .otherwise(F.lit(0)).cast("long"))
                 .alias("selected_id_sum")))


_WS_K = 100

_WEIGHTED_SAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, n_chars AS weight,
         round(-ln((CAST(('0x' || substr(md5('ws|' ||
                    CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                    + 0.5) / {float(S.HASH_SPACE)}) * {S.WEIGHTED_FIX},
               0) / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0)
SELECT doc_id, CAST(weight AS BIGINT) AS weight,
       CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT) AS rn
FROM keyed ORDER BY key, doc_id LIMIT {_WS_K}
"""


@extra_query("documents_weighted_sample", oracle=_WEIGHTED_SAMPLE_ORACLE)
def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sampling without replacement (operators/
    sampling.py weighted_sample — Efraimidis & Spirakis 2006
    exponential keys): the top-100 docs by smallest -ln(u)/n_chars,
    i.e. a without-replacement draw where selection probability tracks
    document length — the data-mixing primitive for byte-budgeted
    subcorpus draws.  One scan + one TakeOrdered(k); the sequential
    k-draw formulation cannot distribute, the key formulation is a
    map."""
    docs = load_table(spark, sf_dir, "documents")
    return S.weighted_sample(docs, "n_chars", _WS_K)


_WSG_K = 20

_WEIGHTED_GROUP_ORACLE = f"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars AS weight,
         round(-ln((CAST(('0x' || substr(md5('ws|' ||
                    CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                    + 0.5) / {float(S.HASH_SPACE)}) * {S.WEIGHTED_FIX},
               0) / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0)
SELECT lang, doc_id, CAST(weight AS BIGINT) AS weight,
       CAST(rn AS BIGINT) AS rn
FROM (SELECT *, row_number() OVER (PARTITION BY lang
            ORDER BY key, doc_id) AS rn
      FROM keyed) t
WHERE rn <= {_WSG_K}
"""


@extra_query("documents_weighted_sample_per_lang",
             oracle=_WEIGHTED_GROUP_ORACLE)
def documents_weighted_sample_per_lang(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Per-language length-weighted draw (operators/sampling.py
    weighted_sample_per_group): exactly 20 weighted
    without-replacement selections per lang in ONE window pass — the
    stratified A-ES form that pairs exact per-stratum counts with
    weight-proportional selection (the eval-carve-out shape with
    weights).  Keys are stratum-independent, so re-bucketing a doc
    never changes its draw priority."""
    docs = load_table(spark, sf_dir, "documents")
    return S.weighted_sample_per_group(docs, "lang", "n_chars", _WSG_K)
