"""Interval statistics + lineage — the reference's StatisticsCollector (G1)
re-expressed declaratively.

The reference keeps running counters (events, bytes, rows, last position,
rows-per-table) flushed by an event-loop timer
(src/StatisticsCollector.php:31-95).  Here the same facts are aggregations
over the decoded stream — `groupBy(window(...))` for time-bucketed
counters, `observe()` for zero-extra-pass streaming metrics — and
per-partition lineage (north-rule A7) is a groupBy over
``spark_partition_id()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def interval_stats(
    decoded: DataFrame,
    interval: str = "1 hour",
    bytes_col: str | None = None,
) -> DataFrame:
    """Tumbling-window per-table counters keyed on event time — the batch
    analog of the reference's per-interval flush (StatisticsCollector.php:50-66).
    Uses date_trunc so the result is plain-SQL comparable.

    ``bytes_col``: optional payload column whose length is summed per
    bucket (e.g. ``after_text`` for the transcripts table); None (the
    default for arbitrary tables) omits the ``payload_bytes`` column."""
    unit = interval.split()[-1].rstrip("s")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("log_pos", "log_file").alias("n_events"),
    ]
    if bytes_col is not None:
        aggs.append(F.sum(F.length(bytes_col)).alias("payload_bytes"))
    return decoded.groupBy(
        F.date_trunc(unit, F.col("event_ts")).alias("bucket_ts"),
        "schema_name",
        "table_name",
    ).agg(*aggs)


def lineage(decoded: DataFrame) -> DataFrame:
    """Applied-LSN ranges per chunk file (per-partition lineage, A7):
    min/max position, row count, distinct keys."""
    return decoded.groupBy("log_file").agg(
        F.min("log_pos").alias("min_pos"),
        F.max("log_pos").alias("max_pos"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("schema_name", "table_name").alias("n_tables"),
    )


def partition_lineage(decoded: DataFrame) -> DataFrame:
    """Physical per-task lineage: which LSN range each Spark partition
    carried — the multi-executor replacement for the reference's single
    running position (EventsIterator.php:90-101)."""
    return (
        decoded.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min(F.struct("log_file", "log_pos")).alias("min_lsn"),
            F.max(F.struct("log_file", "log_pos")).alias("max_lsn"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def observed(decoded: DataFrame, name: str = "cdc") -> tuple[DataFrame, Observation]:
    """Attach an Observation collecting the reference's counters without an
    extra action (the streaming-safe analog of pushEvent/pushRowEvent,
    StatisticsCollector.php:77-95)."""
    obs = Observation(name)
    out = decoded.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        # observe() forbids DISTINCT aggregates; approx_count_distinct is
        # the observed-metrics idiom for cardinality
        F.approx_count_distinct("log_file").alias("files"),
        F.min("log_pos").alias("min_pos"),
        F.max("log_pos").alias("max_pos"),
    )
    return out, obs
