"""Streaming-native dedup + windowed statistics.

The live-tail twin of the batch operators: the north star pins the dedup
mechanism to ``dropDuplicatesWithinWatermark`` keyed by the LSN triple
under an event-time watermark (BASELINE.json:6) — exact re-deliveries
(reconnect replays, producer retries) are dropped as long as they arrive
within the watermark horizon; per-key last-writer-wins still runs in the
sink (max_by is order-insensitive, so late-but-in-horizon events cannot
flip a winner).

Also here: the streaming twins of the G1 interval statistics
(StatisticsCollector.php:50-66) as watermarked tumbling windows, and
gap-based sessionization via ``session_window``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

LSN_KEY = ["log_file", "log_pos", "server_id"]


def stream_changes(
    spark: SparkSession, changelog_dir: str, schema_ddl: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over decoded change-log parquet (the replay-tail
    shape; a live deployment swaps in any streaming source with the same
    schema)."""
    r = spark.readStream.schema(schema_ddl)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(changelog_dir)


def stream_dedup(
    changes: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    lsn_cols: list[str] | None = None,
) -> DataFrame:
    """Exact re-delivery dedup under an event-time watermark."""
    cols = [c for c in (lsn_cols or LSN_KEY) if c in changes.columns]
    if "batch_seq" in changes.columns:
        cols = cols + ["batch_seq"]
    return changes.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        cols
    )


def stream_interval_stats(
    changes: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window per-table counters (streaming G1)."""
    return (
        changes.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            "schema_name",
            "table_name",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("action") == "insert", 1).otherwise(0)).alias(
                "n_inserts"
            ),
            F.sum(F.when(F.col("action") == "delete", 1).otherwise(0)).alias(
                "n_deletes"
            ),
        )
        .select(
            F.col("win.start").alias("bucket_start"),
            F.col("win.end").alias("bucket_end"),
            "schema_name", "table_name", "n_rows", "n_inserts", "n_deletes",
        )
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions via the built-in session_window (the streaming
    twin of operators/sessionize.py)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(user_col, "n_events", "session_start", "session_end")
    )


class ProgressLog(StreamingQueryListener):
    """StreamingQueryListener shim: collects per-batch progress the way the
    reference's StatisticsCollector flushes per interval (rows/sec, batch
    durations) — attach with ``spark.streams.addListener(ProgressLog())``."""

    def __init__(self):
        self.progress: list[dict] = []

    def onQueryStarted(self, event):  # noqa: N802 (Spark listener API)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "rows_per_sec": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
            }
        )

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass
