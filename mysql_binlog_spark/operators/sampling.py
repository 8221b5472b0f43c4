"""Deterministic sampling and sequence packing for training-data curation.

Two operations every large-scale pre-training pipeline needs between
dedup and tokenization:

* **Deterministic hash sampling** — per-row keep/drop decided by a hash
  of the row's stable key, not an RNG: re-runs, retries, and different
  cluster sizes produce the SAME sample (a property Spark's
  ``df.sample`` does not give across re-planning).  Stratified rates
  (e.g. down-weight the dominant language) are a CASE over the same
  hash fraction, so the sample is *nested*: lowering a stratum's rate
  yields a subset of the higher-rate sample — the standard property for
  reproducible data ablations.
* **Token-budget sequence packing** — assign documents to fixed token
  budgets (context windows) by cumulative token count within a shard.
  ``bin_id = floor(cum_tokens_before / budget)`` packs contiguously
  with at most one document overflowing each boundary — the shuffle-free
  approximation used in production packing (exact first-fit is
  inherently sequential).  Packing is PER GROUP (``group_col``): each
  shard packs independently, so the operation parallelizes by shard at
  100 TB instead of serializing behind one global ordering window.

Scale shapes: the sample is a stateless per-row filter (no shuffle, no
RNG state); packing shuffles once on ``group_col`` and runs one
window per group — groups (sources, language shards, date buckets) are
the natural parallelism unit.

All hashes go through functions.hashing.md5_bigint so every operator
here has an exact DuckDB oracle twin (driver_queries doc_sample /
doc_pack).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5_bigint

_HASH_SPACE = float(1 << 48)


def hash_fraction(key: Column, seed: int = 0) -> Column:
    """Uniform [0, 1) fraction derived from md5 of (key, seed) — the
    deterministic coin every sampler here flips."""
    return md5_bigint(F.concat(key.cast("string"), F.lit(f"#smp{seed}"))) / (
        F.lit(_HASH_SPACE)
    )


def hash_fraction_sql(key_expr: str, seed: int = 0) -> str:
    """DuckDB twin of hash_fraction."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '#smp{seed}'),"
        f" 1, 12))::BIGINT / {_HASH_SPACE})"
    )


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep each row iff hash_fraction(key) < rate.  Stateless, RNG-free,
    stable under re-runs and repartitioning."""
    return df.filter(hash_fraction(F.col(key_col), seed) < rate)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (language/source rebalancing).

    ``rates`` maps stratum value → keep rate; unlisted strata use
    ``default_rate``.  Same hash fraction across strata ⇒ nested
    samples across rate changes."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(
            rate
        )
    return df.filter(hash_fraction(F.col(key_col), seed) < rate)


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_tokens: Column,
    group_col: str = "source",
    order_col: str = "doc_id",
    length_bucketed: bool = False,
) -> DataFrame:
    """Assign each document a ``bin_id`` inside its group such that the
    documents of one bin total ≈ ``budget`` tokens (contiguous packing
    by cumulative count; a boundary document overflows its bin by at
    most itself).  Output: group, order key, n_tokens, bin_id.

    ``length_bucketed=True`` orders each shard by ``n_tokens DESC``
    (``order_col`` as the deterministic tiebreak) — the standard
    fill-ratio improvement: long documents are placed first, so the
    short tail fills boundary gaps instead of each long straggler
    overflowing into a fresh bin.  Same plan shape either way: one
    shuffle (by group), one window per group — no global ordering.
    """
    nt = n_tokens.cast("bigint")
    order = (
        [nt.desc(), F.col(order_col)]
        if length_bucketed
        else [F.col(order_col)]
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(nt).over(w), F.lit(0))
    return df.select(
        F.col(group_col),
        F.col(order_col),
        nt.alias("n_tokens"),
        F.floor(cum_before / F.lit(budget)).cast("int").alias("bin_id"),
    )


# ------------------------------------------- temperature source mixing

# Temperature-weighted source rebalancing (the data-mixing step of
# GPT-3/PaLM-style pipelines, public recipe: sample source i with
# probability ∝ count_i^α, α < 1 flattening the source distribution).
# α is fixed at 0.5 because sqrt is an IEEE-754 correctly-rounded
# operation — Spark and DuckDB agree bit-for-bit, where a general
# pow(count, α) may differ in the last ulp and flip an integer floor.
# Everything downstream of the sqrt is exact int64 arithmetic:
#
#   weight_i    = floor(sqrt(count_i) · 2^10)          (2^10 = exact scale)
#   share_i     = weight_i · 2^26 div Σ weight         ∈ [0, 2^26]
#   budget      = N_total · budget_num div budget_den  (output size)
#   target_i    = share_i · budget div 2^26            (docs to keep)
#   threshold_i = min(2^20, target_i · 2^20 div count_i)
#   keep doc    ⇔ md5_bigint(key ‖ seed) mod 2^20 < threshold_i
#
# The budget is a RATIONAL (num/den), not a float, so the whole chain
# after the sqrt stays exact.  Small sources whose flattened target
# exceeds their size cap at keep-everything (no replication in a
# keep/drop sampler); the cut lands on the dominant sources — exactly
# the rebalancing the recipe is for.
#
# Ranges: weight ≤ √c·2^10 ≤ 2^27 for c ≤ 10^10, so weight·2^26 < 2^53
# and share·N < 2^56 — no int64 overflow for any realistic corpus.
# The keep-decision is the same deterministic hash coin as
# deterministic_sample: re-runs and different cluster sizes keep the
# SAME documents, and raising a source's share keeps a superset.
#
# Scale shape: one small groupBy for the per-source counts, window over
# the TINY counts frame for the totals, then a BROADCAST join of the
# thresholds back onto the corpus and a stateless per-row filter — the
# big side never shuffles.

_TMP_W = 1 << 10
_TMP_S = 1 << 26
_TMP_M = 1 << 20


def temperature_kept(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    budget_num: int = 1,
    budget_den: int = 1,
) -> DataFrame:
    """The KEPT rows of the temperature-0.5 resample (all input columns
    plus the per-source n_docs/weight/target stats) — the composable
    half of temperature_resample: feed these into packing, shuffling, or
    a writer.  Broadcast thresholds; the corpus side never shuffles."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    whole = Window.partitionBy()
    stats = (
        counts.withColumn(
            "weight",
            F.floor(F.sqrt(F.col("n_docs")) * _TMP_W).cast("bigint"),
        )
        .withColumn("total_w", F.sum("weight").over(whole))
        .withColumn("total_n", F.sum("n_docs").over(whole))
        .withColumn("share", F.expr(f"weight * {_TMP_S} div total_w"))
        .withColumn(
            "budget",
            F.expr(f"total_n * {budget_num} div {budget_den}"),
        )
        .withColumn("target", F.expr(f"share * budget div {_TMP_S}"))
        .withColumn(
            "threshold",
            F.least(
                F.lit(_TMP_M).cast("bigint"),
                F.expr(f"target * {_TMP_M} div n_docs"),
            ),
        )
        .select(source_col, "n_docs", "weight", "target", "threshold")
    )
    coin = md5_bigint(
        F.concat(F.col(key_col).cast("string"), F.lit(f"#tmp{seed}"))
    ) % _TMP_M
    return df.join(F.broadcast(stats), source_col).filter(
        coin < F.col("threshold")
    )


def temperature_resample(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    budget_num: int = 1,
    budget_den: int = 1,
) -> DataFrame:
    """Per-source summary of a temperature-0.5 resample targeting an
    output of ``N_total · budget_num / budget_den`` documents: (source,
    n_docs, weight, target, n_kept).  The kept rows themselves come from
    ``temperature_kept``; the summary is what the oracle gates (n_kept
    pins the exact membership hash-wise via the deterministic coin)."""
    kept = temperature_kept(
        df, source_col, key_col, seed, budget_num, budget_den
    )
    return kept.groupBy(source_col, "n_docs", "weight", "target").agg(
        F.count("*").alias("n_kept")
    )


def _temperature_ctes(
    source_col: str,
    key_col: str,
    seed: int,
    rel: str,
    budget_num: int,
    budget_den: int,
) -> tuple[str, str]:
    """(CTE text for counts/stats/thresholds, coin expression) — shared
    by the resample-summary and training-mix DuckDB twins."""
    coin = (
        f"(('0x' || substr(md5(CAST({key_col} AS VARCHAR) || '#tmp{seed}'),"
        f" 1, 12))::BIGINT % {_TMP_M})"
    )
    ctes = f"""counts AS (
      SELECT {source_col}, COUNT(*) AS n_docs FROM {rel} GROUP BY 1
    ),
    stats AS (
      SELECT {source_col}, n_docs,
             CAST(floor(sqrt(n_docs) * {_TMP_W}) AS BIGINT) AS weight,
             -- DuckDB SUM(BIGINT) returns HUGEINT; cast back so the whole
             -- integer chain stays int64 like the Spark side
             CAST(SUM(CAST(floor(sqrt(n_docs) * {_TMP_W}) AS BIGINT))
                  OVER () AS BIGINT) AS total_w,
             CAST(SUM(n_docs) OVER () AS BIGINT) AS total_n
      FROM counts
    ),
    thresholds AS (
      SELECT {source_col}, n_docs, weight,
             CAST((weight * {_TMP_S} // total_w)
                  * (total_n * {budget_num} // {budget_den}) // {_TMP_S}
                  AS BIGINT) AS target,
             CAST(LEAST({_TMP_M},
                   ((weight * {_TMP_S} // total_w)
                    * (total_n * {budget_num} // {budget_den}) // {_TMP_S})
                     * {_TMP_M} // n_docs) AS BIGINT) AS threshold
      FROM stats
    )"""
    return ctes, coin


def temperature_resample_sql(
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    rel: str = "documents",
    budget_num: int = 1,
    budget_den: int = 1,
) -> str:
    """DuckDB twin: identical sqrt + int64 chain + md5 coin."""
    ctes, coin = _temperature_ctes(
        source_col, key_col, seed, rel, budget_num, budget_den
    )
    return f"""
    WITH {ctes}
    SELECT t.{source_col}, t.n_docs, t.weight, t.target,
           COUNT(*) AS n_kept
    FROM {rel} d JOIN thresholds t USING ({source_col})
    WHERE {coin} < t.threshold
    GROUP BY 1, 2, 3, 4
    """


# ------------------------------------------------- training-order shuffle

# Deterministic global shuffle + sharding: the step that turns a curated
# corpus into a training order.  Position = rank of md5(key ‖ seed)
# within the document's shard (shard = hash mod n_shards), so the order
# is (a) uniform, (b) identical on any cluster size / re-run, and
# (c) computed with ONE shuffle on the shard key and a per-shard sort —
# never a global ORDER BY (rangepartitioning + skew at 100 TB).  Readers
# stream shard files in (shard, pos) order; cross-shard interleaving is
# the reader's round-robin, standard practice for sharded training data.


def training_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    n_shards: int = 16,
    seed: int = 0,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """(key, *carry, shard, pos): a reproducible random order, parallel
    by shard.  Hash ties (md5 collisions) break on the key for full
    determinism."""
    carry = carry_cols or []
    h = md5_bigint(
        F.concat(F.col(key_col).cast("string"), F.lit(f"#shuf{seed}"))
    )
    out = df.select(F.col(key_col), *carry, h.alias("h"))
    out = out.withColumn("shard", (F.col("h") % n_shards).cast("int"))
    w = Window.partitionBy("shard").orderBy("h", key_col)
    return out.select(
        key_col,
        *carry,
        "shard",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
    )


def training_shuffle_sql(
    key_col: str = "doc_id",
    n_shards: int = 16,
    seed: int = 0,
    rel: str = "documents",
) -> str:
    h = (
        f"('0x' || substr(md5(CAST({key_col} AS VARCHAR) || '#shuf{seed}'),"
        f" 1, 12))::BIGINT"
    )
    return f"""
    WITH hashed AS (
      SELECT {key_col}, {h} AS h,
             CAST({h} % {n_shards} AS INT) AS shard
      FROM {rel}
    )
    SELECT {key_col}, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, {key_col})
                - 1 AS BIGINT) AS pos
    FROM hashed
    """


# --------------------------------------------------- end-to-end curation mix

# The last mile of a curation pipeline, composed from the pieces above:
# temperature-resample the sources to the output budget, then lay the
# kept documents into a reproducible sharded training order.  Scale
# shape is the union of its parts: broadcast thresholds + stateless
# keep filter (corpus never shuffles for the mix decision), then ONE
# hashpartitioning(shard) exchange for the order.


def training_mix(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    budget_num: int = 1,
    budget_den: int = 1,
    n_shards: int = 16,
) -> DataFrame:
    """(key, source, shard, pos) for the temperature-resampled corpus in
    deterministic training order."""
    kept = temperature_kept(
        df, source_col, key_col, seed, budget_num, budget_den
    )
    return training_shuffle(
        kept, key_col, n_shards, seed, carry_cols=[source_col]
    )


def training_mix_sql(
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    rel: str = "documents",
    budget_num: int = 1,
    budget_den: int = 1,
    n_shards: int = 16,
) -> str:
    ctes, coin = _temperature_ctes(
        source_col, key_col, seed, rel, budget_num, budget_den
    )
    h = (
        f"('0x' || substr(md5(CAST({key_col} AS VARCHAR) || '#shuf{seed}'),"
        f" 1, 12))::BIGINT"
    )
    return f"""
    WITH {ctes},
    kept AS (
      SELECT d.{key_col}, d.{source_col}
      FROM {rel} d JOIN thresholds t USING ({source_col})
      WHERE {coin} < t.threshold
    ),
    hashed AS (
      SELECT {key_col}, {source_col}, {h} AS h,
             CAST({h} % {n_shards} AS INT) AS shard
      FROM kept
    )
    SELECT {key_col}, {source_col}, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, {key_col})
                - 1 AS BIGINT) AS pos
    FROM hashed
    """


def train_val_test_split(
    df: DataFrame,
    val: float = 0.1,
    test: float = 0.1,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """(key, split): deterministic train/val/test assignment — split
    boundaries on the SAME hash fraction the samplers use, so the
    assignment is stable under re-runs, repartitioning, and corpus
    growth (a document's split never changes when other documents
    arrive — the leakage-safety property random splits lack).

    100 TB shape: a stateless per-row projection, zero exchanges; the
    split column is a pushdown-friendly partition key for the writer."""
    f = hash_fraction(F.col(key_col), seed)
    split = (
        F.when(f < test, F.lit("test"))
        .when(f < test + val, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.select(F.col(key_col), split.alias("split"))


def train_val_test_split_sql(
    val: float = 0.1,
    test: float = 0.1,
    key_col: str = "doc_id",
    seed: int = 0,
    rel: str = "documents",
) -> str:
    """DuckDB twin: identical hash boundaries."""
    f = hash_fraction_sql(key_col, seed)
    return f"""
    SELECT {key_col},
           CASE WHEN {f} < {test} THEN 'test'
                WHEN {f} < {test + val} THEN 'val'
                ELSE 'train' END AS split
    FROM {rel}
    """
