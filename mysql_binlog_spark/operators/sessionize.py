"""Event-stream sessionization (gap-based) — the windowed-aggregation
operator family the reference's interval statistics hint at (G1), grown to
the shape a transcript/events pipeline actually needs.

Batch form: lag + running sum of boundary flags (two window functions over
the same (user, ts) ordering → single shuffle).  Streaming twin:
``groupBy(session_window(ts, gap), user)`` in Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # TIMESTAMP_NTZ cannot cast to BIGINT directly; go through TIMESTAMP
    # (session tz is pinned UTC, so the epoch is unambiguous)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    boundary = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = events.withColumn("_b", boundary).withColumn(
        "session_idx", F.sum("_b").over(w)
    )
    return with_sess.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def sessionize_sql(
    rel: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> str:
    """DuckDB twin (epoch() returns seconds)."""
    return f"""
    WITH flagged AS (
      SELECT {user_col}, {ts_col},
        CASE WHEN FLOOR(epoch({ts_col}))::BIGINT
                  - FLOOR(epoch(LAG({ts_col}) OVER w))::BIGINT
                  > {gap_minutes * 60}
               OR LAG({ts_col}) OVER w IS NULL
             THEN 1 ELSE 0 END AS b
      FROM {rel}
      WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col})
    ), sess AS (
      SELECT {user_col}, {ts_col},
        CAST(SUM(b) OVER (PARTITION BY {user_col} ORDER BY {ts_col}) AS BIGINT)
          AS session_idx
      FROM flagged
    )
    SELECT {user_col}, session_idx, COUNT(*) AS n_events,
           MIN({ts_col}) AS session_start, MAX({ts_col}) AS session_end
    FROM sess GROUP BY {user_col}, session_idx
    """
