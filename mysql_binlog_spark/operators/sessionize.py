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


def rate_window(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window_sec: int = 60,
) -> DataFrame:
    """Per-event trailing rate: how many events (and how much integer
    value) the same user produced in the preceding ``window_sec``
    seconds, EXCLUDING the current second — the rolling signal behind
    rate limiting / burst detection / fraud features.

    RANGE frame on epoch seconds, not a row frame: the window is
    time-based, so ties and gaps are handled by value, which makes the
    result independent of row order within a second — deterministic
    under any partitioning.  One shuffle on the user key, one sorted
    pass; Spark's native range-window operator (no self-join explosion:
    the naive ``e1 JOIN e2 ON user AND ts BETWEEN ...`` is quadratic in
    the hot user).

    ``value`` is folded as integer cents (``floor(value·100)``) so the
    windowed sum is order-free exact int64 — a float sum's association
    order differs between engines and would break the oracle hash."""
    sec = F.unix_timestamp(F.col(ts_col))
    cents = F.floor(F.col(value_col) * 100).cast("bigint")
    w = (
        Window.partitionBy(user_col)
        .orderBy(sec)
        .rangeBetween(-window_sec, -1)
    )
    return df.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_prev"),
        F.coalesce(F.sum(cents).over(w), F.lit(0)).cast("bigint").alias(
            "prev_value_cents"
        ),
    )


def rate_window_sql(
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window_sec: int = 60,
    rel: str = "events",
) -> str:
    """DuckDB twin: same epoch-second RANGE frame, same integer fold."""
    return f"""
    SELECT {id_col}, {user_col}, {ts_col},
           CAST(COUNT(*) OVER w AS BIGINT) AS n_prev,
           CAST(COALESCE(SUM(CAST(FLOOR({value_col} * 100) AS BIGINT))
                         OVER w, 0) AS BIGINT) AS prev_value_cents
    FROM {rel}
    WINDOW w AS (
      PARTITION BY {user_col}
      ORDER BY CAST(FLOOR(epoch({ts_col})) AS BIGINT)
      RANGE BETWEEN {window_sec} PRECEDING AND 1 PRECEDING
    )
    """
