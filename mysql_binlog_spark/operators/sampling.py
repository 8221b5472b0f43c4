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
