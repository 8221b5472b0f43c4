"""Streaming-native operator tests: dropDuplicatesWithinWatermark dedup,
watermarked window stats, session_window sessionization, progress listener."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from mysql_binlog_spark import spec
from mysql_binlog_spark.operators.sessionize import sessionize
from mysql_binlog_spark.streaming.dedup import (
    ProgressLog,
    stream_changes,
    stream_dedup,
    stream_interval_stats,
    stream_sessionize,
)

CHANGELOG_DDL = (
    "log_file string, log_pos bigint, server_id bigint, xid bigint, "
    "ts timestamp, schema_name string, table_name string, action string, "
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "tool_version string"
)


def _changelog_dir(spark, sf_dir) -> str:
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).createOrReplaceTempView(
        "events"
    )
    df = spark.sql(spec.changelog_sql("spark", with_duplicates=True))
    out = tempfile.mkdtemp(prefix="mbs_stream_src_")
    df.repartition(4).write.mode("overwrite").parquet(out)
    return out


def _drain(stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if not stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


def test_stream_dedup_within_watermark(spark, sf_dir):
    src = _changelog_dir(spark, sf_dir)
    changes = stream_changes(spark, src, CHANGELOG_DDL, max_files_per_trigger=2)
    listener = ProgressLog()
    spark.streams.addListener(listener)
    try:
        q = (
            stream_dedup(changes)
            .writeStream.format("memory")
            .queryName("dedup_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.streams.removeListener(listener)
    got = spark.table("dedup_sink")
    batch = spark.read.parquet(src)
    want = batch.dropDuplicates(["log_file", "log_pos", "server_id"]).count()
    assert got.count() == want
    assert batch.count() > want  # fixture really contained re-deliveries
    # listener events are delivered asynchronously — poll before asserting
    import time as _time

    total = batch.count()
    deadline = _time.time() + 30
    while (
        sum(p["num_input_rows"] for p in listener.progress) < total
        and _time.time() < deadline
    ):
        _time.sleep(0.2)
    assert len(listener.progress) >= 1
    assert sum(p["num_input_rows"] for p in listener.progress) == total


def test_stream_interval_stats_matches_batch(spark, sf_dir):
    src = _changelog_dir(spark, sf_dir)
    changes = stream_changes(spark, src, CHANGELOG_DDL)
    q = (
        stream_interval_stats(changes)
        .writeStream.format("memory")
        .queryName("stats_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["bucket_start"], r["schema_name"], r["table_name"]): r["n_rows"]
        for r in spark.table("stats_sink").collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(
            F.date_trunc("hour", "ts").alias("b"), "schema_name", "table_name"
        )
        .count()
        .collect()
    )
    want = {(r["b"], r["schema_name"], r["table_name"]): r["count"] for r in batch}
    # availableNow drains everything; watermark only finalizes windows older
    # than the horizon, so the streamed append sink may lack the trailing
    # windows — every emitted window must match the batch truth exactly
    assert got and all(want.get(k) == v for k, v in got.items())


def test_stream_sessionize_matches_batch(spark, sf_dir):
    ev_path = os.path.join(sf_dir, "events.parquet")
    ev = spark.read.parquet(ev_path)
    sessions_batch = sessionize(ev.withColumn("ts", F.col("ts").cast("timestamp")))
    src = tempfile.mkdtemp(prefix="mbs_sess_src_")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ).parquet(src)
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("sess_sink")
    want_counts = sorted(
        (r["user_id"], r["n_events"])
        for r in sessions_batch.collect()
    )
    got_counts = sorted((r["user_id"], r["n_events"]) for r in got.collect())
    # the append sink omits sessions newer than the watermark horizon —
    # whatever was finalized must agree with the batch sessionization
    finalized = len(got_counts)
    assert finalized > 0
    assert got_counts == [c for c in want_counts if c in got_counts] or (
        set(got_counts) <= set(want_counts)
    )


def test_stateful_conv_progress(spark, sf_dir):
    from mysql_binlog_spark.streaming.stateful import conv_progress

    src = _changelog_dir(spark, sf_dir)
    changes = stream_changes(spark, src, CHANGELOG_DDL, max_files_per_trigger=2)
    q = (
        conv_progress(changes)
        .writeStream.format("memory")
        .queryName("prog_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # update-mode sink: LAST emitted row per conv carries cumulative state
    import pyspark.sql.functions as SF

    sink = spark.table("prog_sink")
    final = (
        sink.groupBy("conv_id")
        .agg(SF.max(SF.struct("n_events", "max_turn", "last_file", "last_pos"))
             .alias("s"))
        .select("conv_id", "s.n_events", "s.max_turn")
    )
    got = {r["conv_id"]: (r["n_events"], r["max_turn"]) for r in final.collect()}
    batch = (
        spark.read.parquet(src)
        .groupBy("conv_id")
        .agg(SF.count(SF.lit(1)).alias("n"), SF.max("turn_idx").alias("mt"))
        .collect()
    )
    want = {r["conv_id"]: (r["n"], r["mt"]) for r in batch}
    assert got == want
