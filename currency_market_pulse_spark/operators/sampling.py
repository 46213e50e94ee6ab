"""Deterministic sampling and dataset splitting for training pipelines.

Every decision is a pure function of a stable row id hashed with the
portable md5 family (functions/text.py conventions): no RNG state, no
sort, rerun-stable, and — the property training pipelines actually
need — stable under corpus growth: a document's train/val/test
assignment never changes when other documents are added or removed, so
re-ingest cannot leak held-out data into train.

The reference has no sampling surface (its one query is an aggregate:
trends/listing/service.go:47-62); these are part of the §2.6
training-data extension tier.

At 100 TB:

- ``hash_split`` / ``stratified_sample`` are narrow zero-shuffle
  projections/filters — they fuse into the scan stage, cost one md5
  per row, and push the split predicate down to the parquet scan when
  the caller filters on one split.
- ``per_group_cap`` is one shuffle on the group key (row_number over a
  deterministic hash order) — identical cost shape to any group-by;
  cap skewed groups the same way as any hot-key aggregate (AQE).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window, functions as F

from currency_market_pulse_spark.materialize import shared

#: 16^15 = 2^60 — the md5-prefix hash space; a 60-bit int divided by
#: this is a uniform fraction in [0, 1).  Both engines do the same
#: IEEE-double division, so thresholds compare bitwise-identically.
HASH_SPACE = 16 ** 15


def hash_long(id_col: Column, seed: str) -> Column:
    """Uniform 60-bit int from a stable id: the portable md5-prefix
    trick (== DuckDB ``('0x' || substr(md5(seed || '|' || id), 1, 15))
    ::BIGINT``)."""
    key = F.concat_ws("|", F.lit(seed), id_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def hash_fraction(id_col: Column, seed: str) -> Column:
    """Uniform double in [0, 1) from a stable id."""
    return hash_long(id_col, seed) / F.lit(float(HASH_SPACE))


def hash_split(df: DataFrame, id_col: str,
               weights: Mapping[str, float],
               seed: str = "split") -> DataFrame:
    """Add a ``split`` column assigning each row to one of the named
    splits with the given weights (normalized), deterministically by
    ``id_col``.

    Assignment is by cumulative threshold on the hash fraction, so
    enlarging one split keeps every row of the smaller prior split in
    place (monotone splits — train at 90% contains train at 80%).
    """
    if len(weights) < 2:
        raise ValueError("hash_split needs >= 2 splits")
    total = float(sum(weights.values()))
    frac = hash_fraction(F.col(id_col), seed)
    names = list(weights)
    case = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        cond = frac < F.lit(cum)
        case = F.when(cond, name) if case is None else case.when(cond, name)
    return df.withColumn("split", case.otherwise(names[-1]))


def split_thresholds(weights: Mapping[str, float]) -> list[tuple[str, float]]:
    """(name, cumulative upper bound) pairs exactly as ``hash_split``
    computes them — exported so oracles can embed the identical float
    literals (same Python accumulation, same IEEE values)."""
    total = float(sum(weights.values()))
    out, cum = [], 0.0
    for name in list(weights)[:-1]:
        cum += weights[name] / total
        out.append((name, cum))
    out.append((list(weights)[-1], 1.0))
    return out


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions: Mapping[str, float],
                      default: float = 0.0,
                      seed: str = "sample") -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: stratum value
    -> sampling rate; unlisted strata get ``default``.  The classic
    rebalancing move (e.g. downsample the dominant language)."""
    frac = hash_fraction(F.col(id_col), seed)
    thresh = None
    for value, rate in fractions.items():
        cond = F.col(strata_col) == value
        thresh = (F.when(cond, rate) if thresh is None
                  else thresh.when(cond, rate))
    thresh = F.lit(default) if thresh is None else thresh.otherwise(default)
    return df.filter(frac < thresh)


def per_group_cap(df: DataFrame, group_col: str, id_col: str,
                  n: int, seed: str = "cap") -> DataFrame:
    """Keep at most ``n`` rows per group, chosen deterministically by
    hash order (ties broken by id) — per-source / per-user caps for
    dataset balancing.  One shuffle on the group key."""
    w = (Window.partitionBy(group_col)
         .orderBy(hash_long(F.col(id_col), seed).asc(),
                  F.col(id_col).asc()))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))


def running_total(df: DataFrame, order_cols: list[Column],
                  weight_col: str, out_col: str = "cum_weight",
                  num_partitions: int | None = None) -> DataFrame:
    """Global running total of ``weight_col`` in ``order_cols`` order —
    the DISTRIBUTED prefix sum.

    The naive expression — ``sum() OVER (ORDER BY ...)`` with no
    PARTITION BY — collapses the whole table into ONE task (Spark plans
    a single-partition Window; at 100 TB that is not slow, it is dead).
    This operator computes the identical result in three scale-safe
    steps:

    1. ``repartitionByRange`` on the order key: partition p holds keys
       strictly below partition p+1, so global order = (partition id,
       within-partition order).  One range shuffle.
    2. Per-partition weight totals (tiny relation, one row per
       partition) -> exclusive prefix via a window over THAT relation
       (single-partition, but over ~num_partitions rows — metadata
       scale, like a kmeans centroid update).
    3. Broadcast the offsets back; within-partition running total via a
       window PARTITIONED by partition id + the offset.

    The result is bitwise equal to the single-window form for any total
    order (``order_cols`` must break ties — include the row id).
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # r17 (guide §2.4/§3.3): ``ranged`` feeds BOTH the per-partition
    # totals aggregate and the final offset join, and AQE exchange
    # reuse does NOT fire across the two references (the
    # spark_partition_id subtree defeats canonicalization — the final
    # plan showed documents scanned twice and range-shuffled twice,
    # with two range-sampling jobs).  A lazy localCheckpoint
    # materializes the ranged relation once; both consumers read its
    # blocks.  Scale posture: callers project to the (id, key, weight)
    # columns before calling (the registered query ships 3 columns),
    # so the checkpointed relation is a narrow fraction of the table —
    # and the alternative without reuse was TWO full scans + TWO range
    # shuffles of the same bytes.
    ranged = shared(df.repartitionByRange(n_parts, *order_cols)
                    .withColumn("_pid", F.spark_partition_id()))
    totals = ranged.groupBy("_pid").agg(
        F.sum(weight_col).alias("_ptotal"))
    # unpartitioned window over ~num_partitions rows (metadata scale)
    # — safe; see session._silence_windowexec_warning
    w_off = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_ptotal").over(w_off), F.lit(0)).alias("_off"))
    w_in = (Window.partitionBy("_pid").orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ranged.join(F.broadcast(offsets), "_pid")
            .withColumn(out_col,
                        F.col("_off") + F.sum(weight_col).over(w_in))
            .drop("_pid", "_off"))


def budget_prefix_sample(df: DataFrame, order_cols: list[Column],
                         weight_col: str, budget: int | float,
                         out_col: str = "cum_weight") -> DataFrame:
    """Select the highest-priority prefix of rows whose cumulative
    ``weight_col`` stays within ``budget`` — the token-budget sampler
    ("give me the best documents up to 2B training tokens").  Built on
    the distributed prefix sum (``running_total``); the cut keeps every
    row whose running total (inclusive) is <= budget, so the selection
    is a deterministic prefix of the priority order."""
    return (running_total(df, order_cols, weight_col, out_col)
            .filter(F.col(out_col) <= budget))


def upsample_epochs(df: DataFrame, strata_col: str,
                    epochs: Mapping[str, int],
                    default: int = 1) -> DataFrame:
    """Mixture up-sampling: replicate each row ``epochs[stratum]``
    times (an ``epoch`` column 1..n distinguishes the copies) — the
    "repeat under-represented sources N times per training epoch"
    move.  Down-weighting stays with ``stratified_sample``; this is
    its multiplicative dual.

    Zero shuffle: a per-row ``explode(sequence(1, n))`` fused into the
    scan — the replication happens where the row already lives, and
    the blow-up factor is the (small, explicit) epoch count, never
    data-dependent.

    Epoch counts must be >= 1 (ValueError otherwise): Spark's
    ``sequence(1, 0)`` DESCENDS to ``[1, 0]`` (the same footgun
    functions/text.py shingles() guards), so an unvalidated 0 would
    silently emit epoch-0 rows while the DuckDB oracle's
    ``generate_series(1, 0)`` is empty — a guaranteed engine
    divergence.  "Drop the stratum" is spelled ``stratified_sample``
    (or a filter), not epochs=0 (ADVICE r4)."""
    bad = {v: r for v, r in epochs.items() if r < 1}
    if bad or default < 1:
        raise ValueError(
            f"upsample_epochs requires every epoch count >= 1, got "
            f"{bad or ''}{' default=' + str(default) if default < 1 else ''}"
            f" — drop strata with a filter/stratified_sample instead")
    n = None
    for value, reps in epochs.items():
        cond = F.col(strata_col) == value
        n = F.when(cond, reps) if n is None else n.when(cond, reps)
    n = F.lit(default) if n is None else n.otherwise(default)
    return df.withColumn("epoch", F.explode(F.sequence(F.lit(1), n)))


def shuffle_shards(df: DataFrame, id_col: str, n_shards: int,
                   seed: str = "shard") -> DataFrame:
    """Deterministic global shuffle laid out as ``n_shards`` shards:
    shard = hash(id) mod n_shards, pos = rank of hash within the
    shard — the "write the training set in random order" step.

    Reading the shards in any round-robin interleave replays a uniform
    pseudo-random permutation of the corpus, yet nothing here is a
    global sort: one shuffle on the shard id, a per-shard window for
    the position.  ``n_shards`` is the parallelism knob — at 100 TB
    you pick shards of a few GB (tens of thousands of shards), so the
    per-shard window is executor-sized by construction.  Rerun-stable
    and growth-stable like every hash decision in this module: a doc's
    (shard, hash) never changes when the corpus grows (its pos can —
    positions are corpus-relative by definition)."""
    h = hash_long(F.col(id_col), seed)
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (df.withColumn("_h", h)
            .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards))
                        .cast("int"))
            .withColumn("pos", F.row_number().over(w))
            .drop("_h"))


def per_group_budget(df: DataFrame, group_col: str,
                     order_cols: list[Column], weight_col: str,
                     budget: int | float,
                     out_col: str = "cum_weight") -> DataFrame:
    """Per-group token budget: within each group, keep the best rows
    until the group's cumulative weight reaches ``budget`` — the data-
    mixture primitive (e.g. "at most 50M tokens per language").  One
    shuffle on the group key; the window is PARTITIONED, so unlike the
    global prefix sum this is scale-safe as plain window arithmetic
    (hot groups are bounded by the budget cut itself)."""
    w = (Window.partitionBy(group_col).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn(out_col, F.sum(weight_col).over(w))
            .filter(F.col(out_col) <= budget))


def dsir_logratios(docs: DataFrame, target_pred: Column,
                   buckets: int = 1024, seed: str = "dsir",
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    non-target (raw-pool) document by how much more likely its tokens
    are under the TARGET corpus's hashed-unigram distribution than
    under the raw pool's own.

    Features are hashed n-gram counts exactly as in the paper: token ->
    bucket = hash mod ``buckets`` (portable md5-family hash, so the
    DuckDB oracle replays bit-for-bit); per-bucket probabilities are
    add-1 smoothed; a doc's log importance ratio is the sum over its
    token OCCURRENCES (multiplicity counts, bag-of-words) of
    log p_target(bucket) - log p_raw(bucket).

    Float-order determinism, the STRONG form: each per-bucket
    log-ratio is fixed to an INTEGER (round(lr * 1e4) as long), the
    per-doc total is an order-independent integer sum, and only the
    final value divides back to a double.  Two gate-found defects
    shaped this: summing rounded DOUBLES left the total order-
    dependent at the last bit (an sf0.001 doc landed on a .5e-6
    boundary), and a 1e-9 quantum was finer than the CROSS-ENGINE
    ``ln`` divergence — JVM Math.log and DuckDB/libm log disagree by
    up to ~5e-13 on identical inputs, which flipped one of 1024
    bucket values at the integer-fixing boundary at sf1.  The 1e-4
    quantum gives ~5e4x margin over that divergence; the ~0.5e-4
    per-term quantization is noise for a selection weight.

    Scale shape: the two bucket histograms are ``buckets``-row
    aggregates (map-side partial, then broadcast back onto the token
    stream), so the corpus is scanned twice and shuffled only by doc
    id for the final per-doc sum — no corpus-sized relation is ever
    joined to another.  At 100 TB the target side is typically tiny
    (a quality corpus); here it is a deterministic hash-split of the
    fixture so the oracle can replay the same split."""
    from currency_market_pulse_spark.functions.text import (
        hex_hash64, tokens,
    )

    toked = (docs.filter(F.col(text_col).isNotNull())
             .withColumn("_is_t", target_pred)
             .select(F.col(id_col), "_is_t",
                     F.explode(tokens(F.col(text_col))).alias("_tok"))
             .withColumn("_b", F.pmod(
                 hex_hash64(F.concat(F.lit(f"{seed}|"), F.col("_tok"))),
                 F.lit(buckets))))
    hist = (toked.groupBy("_b")
            .agg(F.sum(F.when(F.col("_is_t"), 1).otherwise(0))
                 .alias("_ct"),
                 F.sum(F.when(~F.col("_is_t"), 1).otherwise(0))
                 .alias("_cr")))
    totals = hist.agg(F.sum("_ct").alias("_tt"),
                      F.sum("_cr").alias("_tr"))
    lr = (hist.crossJoin(F.broadcast(totals))
          .select("_b", F.round(
              (F.log((F.col("_ct") + 1)
                     / (F.col("_tt") + F.lit(buckets)))
               - F.log((F.col("_cr") + 1)
                       / (F.col("_tr") + F.lit(buckets))))
              * F.lit(10_000), 0).cast("long")
              .alias("_lri")))
    return (toked.filter(~F.col("_is_t"))
            .join(F.broadcast(lr), "_b")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.sum("_lri") / F.lit(10_000.0), 6)
                 .alias("log_ratio"))
            .select(id_col, "n_tokens", "log_ratio"))


#: Quantum for the sqrt(n) mass terms of ``temperature_sample``: each
#: stratum's mass becomes an exact integer (floor(sqrt(n) * 1e6)), so
#: the cross-stratum total is an order-independent integer sum — the
#: same strong-determinism discipline as the NLL/DSIR log scores
#: (only transcendentals and SUM ORDER are engine-divergent; +,*,/ and
#: sqrt are IEEE exactly-rounded and portable).
TEMP_MASS_QUANTUM = 1_000_000


def temperature_sample(df: DataFrame, strata_col: str, id_col: str,
                       budget: int, seed: str = "alpha") -> DataFrame:
    """Temperature-based (alpha-mixing) stratified sampling at
    alpha = 0.5: each stratum's target share of a ``budget``-row sample
    is proportional to sqrt(n_stratum) rather than n_stratum — the
    multilingual rebalancing rule of Conneau & Lample 2019 (XLM) /
    Arivazhagan et al. 2019, which damps head languages and boosts the
    tail without the unbounded blow-up of uniform shares.  Adds
    ``rate`` (the stratum's per-row keep probability, capped at 1.0)
    and ``keep`` (deterministic per-row hash Bernoulli).

    alpha is FIXED at 0.5 because sqrt is IEEE-exactly-rounded and so
    bit-portable across engines; a general pow(n, alpha) goes through
    exp/ln, whose cross-engine ~5e-13 divergence this repo has already
    caught flipping comparisons at scale (SURVEY round-5 log).  A
    different alpha needs the quantized-log discipline of
    ``dsir_logratios``, not a naive pow.

    Determinism bound: rate arithmetic stays in exact BIGINTs until one
    final double division; ``S * n`` must fit in int64, which holds to
    ~1e9 rows per stratum at this quantum — beyond that, shrink
    TEMP_MASS_QUANTUM (the rate precision cost is 1/quantum).

    Scale shape: one tiny stratum-count aggregate (partial, ~|strata|
    rows), rates broadcast-joined back, keep fused into the scan
    projection — the corpus itself never shuffles.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    mass = counts.withColumn(
        "_s", F.floor(F.sqrt(F.col("_n").cast("double"))
                      * F.lit(float(TEMP_MASS_QUANTUM))).cast("long"))
    tot = mass.agg(F.sum("_s").alias("_tot"))
    rates = (mass.crossJoin(F.broadcast(tot))
             .withColumn("rate", F.least(
                 F.lit(1.0),
                 (F.col("_s") * F.lit(budget)).cast("double")
                 / (F.col("_tot") * F.col("_n")).cast("double")))
             .select(strata_col, "rate"))
    return (df.join(F.broadcast(rates), strata_col)
            .withColumn("keep",
                        hash_fraction(F.col(id_col), seed)
                        < F.col("rate")))


#: Fixed-point quantum for the exponential keys of ``weighted_sample``
#: (the NLL/DSIR ln() discipline: snap the transcendental, keep every
#: later op IEEE-portable).
WEIGHTED_FIX = 1_000_000


def es_key(id_col: Column, weight_col: Column, seed: str) -> Column:
    """The Efraimidis & Spirakis exponential key -ln(u)/w as ONE
    definition shared by ``weighted_sample`` / ``_per_group`` and the
    streaming reservoir (streaming/reservoir_stream.py) — a row's key
    depends only on (seed, id, weight), never on which batch or engine
    computed it, which is what makes the streamed bottom-k provably
    equal to the batch draw.

    u = (hash+0.5)/2^60 is never 0 (h=0 -> 0.5/2^60); for h >= 2^53
    the +0.5 is absorbed by double rounding IDENTICALLY on both
    engines; -ln(u) is snapped to 1e-6 fixed point (the repo-wide ln()
    ulp discipline) and the key is one exactly-rounded IEEE division
    of that integer by the weight."""
    h = hash_long(id_col, seed)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(HASH_SPACE))
    efix = F.round(-F.log(u) * WEIGHTED_FIX, 0).cast("long")
    return efix / weight_col.cast("double")


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str = "doc_id",
                    seed: str = "ws") -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, A-ES): each row draws u = hash(id)
    uniform in (0, 1] and the k rows with smallest -ln(u)/w win —
    exactly a weighted-without-replacement draw, as one dataset-wide
    top-k instead of k sequential dependent draws.

    This is THE distributed form of the operation: sequential WR
    sampling is inherently serial (each draw changes the remaining
    pool), while exponential keys are embarrassingly parallel — one
    map to key each row, one TakeOrdered(k).  At 100 TB that is a scan
    plus a k-row reduction, no shuffle of the data.

    Determinism: u comes from the portable md5-prefix hash (seeded,
    replayable); -ln(u) is snapped to 1e-6 fixed point (the repo-wide
    ln() ulp discipline) and the key is one exactly-rounded IEEE
    division of that integer by the weight; ties break on id.  Rows
    with weight <= 0 are excluded (their key would be infinite /
    flipped)."""
    key = es_key(F.col(id_col), F.col(weight_col), seed)
    # unpartitioned window over k rows (post-limit) — safe; see
    # session._silence_windowexec_warning
    w = Window.orderBy("key", id_col)
    return (df.filter(F.col(weight_col) > 0)
            .select(F.col(id_col), F.col(weight_col).alias("weight"),
                    key.alias("key"))
            .orderBy("key", id_col).limit(k)
            .withColumn("rn", F.row_number().over(w))
            .select(id_col, "weight", "rn"))


def weighted_sample_per_group(df: DataFrame, group_col: str,
                              weight_col: str, k: int,
                              id_col: str = "doc_id",
                              seed: str = "ws") -> DataFrame:
    """Per-stratum weighted sampling without replacement: the
    ``weighted_sample`` exponential keys ranked WITHIN each group —
    k weighted draws per language/source/shard in one window pass,
    the stratified form of the A-ES draw (stratified_sample gives
    per-stratum Bernoulli RATES; this gives exact per-stratum COUNTS
    with weight-proportional selection).  Same key function, so a
    row's key is independent of its stratum: re-bucketing documents
    never changes any row's draw priority, only which pool it
    competes in (append-stability under re-stratification)."""
    key = es_key(F.col(id_col), F.col(weight_col), seed)
    w = Window.partitionBy(group_col).orderBy("key", id_col)
    return (df.filter(F.col(weight_col) > 0)
            .select(F.col(group_col), F.col(id_col),
                    F.col(weight_col).alias("weight"),
                    key.alias("key"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(group_col, id_col, "weight", "rn"))
