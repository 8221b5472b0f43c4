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


# ---------------------------------------------------------------- funnel

# Ordered multi-step funnel per user: step i counts only at/after the
# user's FIRST completion of step i-1 (the standard conversion-funnel
# semantics — a purchase before any view does not convert).  Chained
# whole-frame windows over ONE user-key shuffle: t1 = min ord of step 1;
# t2 = min ord of step 2 with ord >= t1; ...  Each chained select reuses
# the same partitionBy(user) spec, so Catalyst plans a single exchange;
# the final per-user collapse is a groupBy on the already-partitioned
# frame.  Never the k-way self-join (quadratic in the hot user, k joins).
#
# Event order is the int64 ord = epoch_sec·2^32 + event_id mod 2^32 —
# identical in both engines, so ties resolve identically by construction
# (within a second the event_id decides; event_id mod 2^32 collisions
# would need 4B events in one second for one user).


def _funnel_ord(ts_col: str, id_col: str) -> F.Column:
    return (
        F.unix_timestamp(F.col(ts_col)) * F.lit(1 << 32)
        + F.pmod(F.col(id_col), F.lit(1 << 32))
    ).cast("bigint")


def funnel(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per user: t_1..t_k (ord of the first in-order completion
    of each step, NULL once the chain breaks) and ``steps_completed``."""
    w = Window.partitionBy(user_col)
    cur = df.select(
        F.col(user_col),
        F.col(type_col),
        _funnel_ord(ts_col, id_col).alias("ord"),
    )
    prev_t = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev_t is not None:
            cond = cond & (F.col("ord") >= F.col(prev_t))
        cur = cur.withColumn(
            f"t_{i}", F.min(F.when(cond, F.col("ord"))).over(w)
        )
        prev_t = f"t_{i}"
    ts = [f"t_{i}" for i in range(1, len(steps) + 1)]
    agg = cur.groupBy(user_col).agg(
        *[F.max(t).alias(t) for t in ts]
    )
    completed = sum(
        (F.col(t).isNotNull()).cast("int") for t in ts
    )
    return agg.select(
        user_col, *ts, completed.cast("int").alias("steps_completed")
    )


def funnel_sql(
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    rel: str = "events",
) -> str:
    """DuckDB twin: identical chained windows and ord encoding."""
    ordx = (
        f"(CAST(FLOOR(epoch({ts_col})) AS BIGINT) * 4294967296"
        f" + {id_col} % 4294967296)"
    )
    sel = f"SELECT {user_col}, {type_col}, {ordx} AS ord FROM {rel}"
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = f"{type_col} = '{step}'"
        if prev:
            cond += f" AND ord >= {prev}"
        sel = (
            f"SELECT *, MIN(CASE WHEN {cond} THEN ord END)"
            f" OVER (PARTITION BY {user_col}) AS t_{i} FROM ({sel})"
        )
        prev = f"t_{i}"
    ts = [f"t_{i}" for i in range(1, len(steps) + 1)]
    maxes = ", ".join(f"MAX({t}) AS {t}" for t in ts)
    completed = " + ".join(
        f"CASE WHEN MAX({t}) IS NOT NULL THEN 1 ELSE 0 END" for t in ts
    )
    return f"""
    SELECT {user_col}, {maxes},
           CAST({completed} AS INT) AS steps_completed
    FROM ({sel}) GROUP BY {user_col}
    """


# ------------------------------------------------------------- retention

# Cohort retention matrix: users are grouped by the week of their first
# event (the cohort); each cell counts distinct users from that cohort
# active N weeks later.  Week index is an integer
# floor(days_since(anchor)/7) — NOT date_trunc('week', ...), whose
# week-start convention is an engine config knob; the integer form is
# bit-identical everywhere.
#
# Plan: one window min over the user partition tags every event with its
# cohort in a single user-key exchange (the groupBy-then-join-back
# alternative shuffles the events twice); the distinct-count collapse
# then shuffles only (cohort, offset, user) triples — already
# de-duplicated map-side by the partial aggregate, so the second
# exchange carries at most |users|·|weeks| rows however many raw events
# exist.


def cohort_retention(
    events: DataFrame,
    anchor: str = "2024-01-01",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users) — distinct active users per
    cohort and offset; offset 0 row is the cohort size."""
    week = F.floor(
        F.datediff(F.col(ts_col).cast("date"), F.lit(anchor).cast("date")) / 7
    )
    tagged = events.select(user_col, week.alias("week"))
    cohort = F.min("week").over(Window.partitionBy(user_col))
    return (
        tagged.withColumn("cohort_week", cohort)
        .groupBy(
            F.col("cohort_week").cast("int").alias("cohort_week"),
            (F.col("week") - F.col("cohort_week"))
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def cohort_retention_sql(
    anchor: str = "2024-01-01",
    user_col: str = "user_id",
    ts_col: str = "ts",
    rel: str = "events",
) -> str:
    """DuckDB twin: identical integer week index and window cohort tag."""
    week = f"CAST(FLOOR(datediff('day', DATE '{anchor}', CAST({ts_col} AS DATE)) / 7) AS BIGINT)"
    return f"""
    WITH tagged AS (
      SELECT {user_col}, {week} AS week FROM {rel}
    ), c AS (
      SELECT {user_col}, week,
             MIN(week) OVER (PARTITION BY {user_col}) AS cohort_week
      FROM tagged
    )
    SELECT CAST(cohort_week AS INT) AS cohort_week,
           CAST(week - cohort_week AS INT) AS week_offset,
           COUNT(DISTINCT {user_col}) AS n_users
    FROM c GROUP BY 1, 2
    """


# ----------------------------------------------------------- transitions

# First-order Markov transition matrix over per-user event streams:
# count (prev_type -> type) pairs for consecutive events of the same
# user, plus the conditional probability P(dst | src).
#
# Plan: ONE user-key exchange for the lag window (ordered by ts with
# event_id as the total-order tie-break so ties can't flip pairs between
# runs), then a (src,dst)-key aggregation with map-side partials.  The
# per-src normalizer is a window over the AGGREGATED matrix — at most
# |event_types|² rows, so the second window exchange is negligible at
# any scale.  Probability is one exact-integer division + round(6),
# invariant to partial-agg merge order.


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(src_type, dst_type, n_transitions, p) for consecutive per-user
    event pairs; p sums to 1 over each src row."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("src_type"),
            F.col(type_col).alias("dst_type"),
        )
        .filter(F.col("src_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    norm = Window.partitionBy("src_type")
    return pairs.withColumn(
        "p",
        F.round(F.col("n_transitions") / F.sum("n_transitions").over(norm), 6),
    )


def transition_matrix_sql(
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    rel: str = "events",
) -> str:
    """DuckDB twin: same tie-broken lag, counts, and normalization."""
    return f"""
    WITH pairs AS (
      SELECT LAG({type_col}) OVER (
               PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}
             ) AS src_type,
             {type_col} AS dst_type
      FROM {rel}
    ), m AS (
      SELECT src_type, dst_type, COUNT(*) AS n_transitions
      FROM pairs WHERE src_type IS NOT NULL GROUP BY src_type, dst_type
    )
    SELECT src_type, dst_type, n_transitions,
           round(n_transitions / SUM(n_transitions) OVER (PARTITION BY src_type),
                 6) AS p
    FROM m
    """


# -------------------------------------------------------------- anomalies

# Hourly volume anomaly detection: z-score of each (event_type, hour)
# count against that type's own hourly distribution.  The monitoring
# query a CDC operator runs against the change stream to catch bursts
# and outages.
#
# Determinism contract: z = (n·H − Σn) / sqrt(H·Σn² − (Σn)²) — every
# term inside the sqrt is an exact bigint (sums of integer counts), and
# IEEE-754 REQUIRES sqrt to be correctly rounded (unlike ln/exp), so
# the whole expression is one exact-int chain + sqrt + one division:
# bit-identical across engines and partition orders.  Degenerate types
# (constant hourly counts ⇒ zero variance) yield NULL, filtered in both
# engines rather than relying on engine-specific inf/NaN division.
#
# 100 TB shape: one (type, hour) aggregation with map-side partials;
# the per-type moment table is |event_types| rows — broadcast back onto
# the hourly counts, nothing corpus-sized moves twice.


def hourly_anomalies(
    events: DataFrame,
    z_thresh: float = 2.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(event_type, bucket_ts, n, z) for hours whose volume deviates
    from the type's mean by >= z_thresh standard deviations."""
    hourly = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    moments = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("h"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    disc = F.col("h") * F.col("s2") - F.col("s1") * F.col("s1")
    z = F.when(
        disc > 0,
        F.round((F.col("n") * F.col("h") - F.col("s1")) / F.sqrt(disc), 6),
    )
    return (
        hourly.join(F.broadcast(moments), "event_type")
        .select("event_type", "bucket_ts", "n", z.alias("z"))
        .filter(F.col("z").isNotNull() & (F.abs("z") >= F.lit(z_thresh)))
    )


def hourly_anomalies_sql(
    z_thresh: float = 2.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
    rel: str = "events",
) -> str:
    """DuckDB twin: identical exact-int moments and guarded z."""
    return f"""
    WITH hourly AS (
      SELECT {type_col} AS event_type,
             date_trunc('hour', {ts_col}) AS bucket_ts,
             COUNT(*) AS n
      FROM {rel} GROUP BY 1, 2
    ), m AS (
      SELECT event_type, COUNT(*) AS h, SUM(n) AS s1, SUM(n * n) AS s2
      FROM hourly GROUP BY event_type
    )
    SELECT event_type, bucket_ts, n,
           CASE WHEN h * s2 - s1 * s1 > 0
                THEN round((n * h - s1) / sqrt(h * s2 - s1 * s1), 6)
           END AS z
    FROM hourly JOIN m USING (event_type)
    WHERE z IS NOT NULL AND abs(z) >= {z_thresh}
    """


# --------------------------------------------------------------- entropy

# Per-user event-type entropy: the behavioral-diversity signature a
# monitoring pipeline uses to separate bots (near-zero entropy — one
# action repeated) from organic users.  H = ln n − (1/n)·Σ c_i·ln c_i
# over the user's per-type counts.
#
# Determinism contract: ln values are quantized to integer nano-nats
# (the repo-wide discipline), so Σ c_i·lnq(c_i) is an exact bigint and
# the per-user result is invariant to partial-agg merge order.  c_i and
# n are exact counts; the only float steps are one division and the
# final rounding.
#
# 100 TB shape: one (user, type) aggregation (map-side partials) → one
# user-key collapse; both keys are uniform, no skew risk beyond what
# the CDC salt already handles.


def user_entropy(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(user_id, n_events, n_types, entropy_nats): per-user event-type
    Shannon entropy in nats (round 6)."""
    q = 1e9
    per = events.groupBy(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("t"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lnq = F.round(F.log("c") * q).cast("bigint")
    per_user = per.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.col("c") * lnq).alias("s"),
    )
    lnq_n = F.round(F.log("n_events") * q).cast("bigint")
    h = (lnq_n - F.col("s") / F.col("n_events")) / F.lit(q)
    return per_user.select(
        "user_id", "n_events", "n_types",
        F.round(h, 6).alias("entropy_nats"),
    )


def user_entropy_sql(
    user_col: str = "user_id",
    type_col: str = "event_type",
    rel: str = "events",
) -> str:
    """DuckDB twin: identical nano-nat quantization."""
    return f"""
    WITH per AS (
      SELECT {user_col} AS user_id, {type_col} AS t, COUNT(*) AS c
      FROM {rel} GROUP BY 1, 2
    ), pu AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             SUM(c * CAST(round(ln(c) * 1e9) AS BIGINT)) AS s
      FROM per GROUP BY user_id
    )
    SELECT user_id, n_events, n_types,
           round((CAST(round(ln(n_events) * 1e9) AS BIGINT) - s / n_events)
                 / 1e9, 6) AS entropy_nats
    FROM pu
    """


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """One-row session-shape summary over the sessionizer's output: the
    engagement report (how long, how many actions, how many bounces).

    Exactness: durations are bigint epoch-second differences and event
    counts are bigints, so every sum is exact and the averages are one
    final division — merge-order-invariant like the rest of the stats
    family.  100 TB shape: sessionize's single user-key exchange, then
    one partial-aggregating collapse to a single row."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    dur = (
        F.col("session_end").cast("timestamp").cast("long")
        - F.col("session_start").cast("timestamp").cast("long")
    )
    n = F.count(F.lit(1))
    return s.select(
        F.col(user_col), F.col("n_events").cast("bigint").alias("ne"),
        dur.alias("dur"),
    ).agg(
        n.cast("bigint").alias("n_sessions"),
        F.countDistinct(user_col).cast("bigint").alias("n_users"),
        F.sum("ne").alias("total_events"),
        F.max("ne").alias("max_events"),
        F.round(F.sum("ne") / n, 6).alias("avg_events"),
        F.max("dur").alias("max_duration_s"),
        F.round(F.sum("dur") / n, 6).alias("avg_duration_s"),
        F.round(
            F.sum((F.col("ne") == 1).cast("bigint")) * 100.0 / n, 6
        ).alias("pct_bounce"),
    )


def session_stats_sql(
    rel: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> str:
    """DuckDB twin over the sessionize twin as a derived table."""
    inner = sessionize_sql(rel, user_col, ts_col, gap_minutes)
    return f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT {user_col}) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(MAX(n_events) AS BIGINT) AS max_events,
           round(SUM(n_events) / COUNT(*), 6) AS avg_events,
           CAST(MAX(FLOOR(epoch(session_end))::BIGINT
                    - FLOOR(epoch(session_start))::BIGINT) AS BIGINT)
             AS max_duration_s,
           round(SUM(FLOOR(epoch(session_end))::BIGINT
                    - FLOOR(epoch(session_start))::BIGINT) / COUNT(*), 6)
             AS avg_duration_s,
           round(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 100.0
                 / COUNT(*), 6) AS pct_bounce
    FROM ({inner}) s
    """


# ------------------------------------------------------------ attribution

# First-touch attribution: each conversion event is credited to the FIRST
# acquisition touch the same user ever produced (at or before the
# conversion in the (ts, event_id) total order).  This is the marketing /
# growth report every event warehouse runs; the naive formulation is a
# per-conversion point-in-time lookup (an as-of join per row), but one
# running window computes every lookup in a single user-key exchange.


def first_touch_attribution(
    events: DataFrame,
    conversion: str = "purchase",
    touches: tuple[str, ...] = ("view", "click", "signup"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(first_touch, n_conversions, n_users, value_cents): conversions
    credited to the user's earliest acquisition touch.

    Plan: ONE window over the user partition ordered by the same
    ``(ts, event_id)`` bigint ord the funnel uses — a running
    ``first(ignorenulls)`` over touch rows tags every event with the
    user's first touch so far, so each conversion reads its attribution
    from its own row; no as-of join, no second exchange (the rollup's
    groupBy keys |touches|+1 values, collapsed map-side).  Conversions
    preceding any touch credit ``'(none)'`` — kept, not dropped: the
    organic-rate denominator is part of the report.  ``value`` folds as
    integer cents (the rate_window convention) so sums are exact and
    merge-order-invariant."""
    ordc = _funnel_ord(ts_col, id_col).alias("ord")
    w = (
        Window.partitionBy(user_col)
        .orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(F.col(type_col).isin(*touches), F.col(type_col))
    tagged = events.select(
        F.col(user_col), F.col(type_col),
        F.floor(F.col(value_col) * 100).cast("bigint").alias("cents"),
        ordc,
    ).withColumn("first_touch", F.first(touch, ignorenulls=True).over(w))
    return (
        tagged.filter(F.col(type_col) == conversion)
        .groupBy(
            F.coalesce(F.col("first_touch"), F.lit("(none)")).alias(
                "first_touch"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.countDistinct(user_col).cast("bigint").alias("n_users"),
            F.sum("cents").alias("value_cents"),
        )
    )


def first_touch_attribution_sql(
    conversion: str = "purchase",
    touches: tuple[str, ...] = ("view", "click", "signup"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    rel: str = "events",
) -> str:
    """DuckDB twin: identical running first-touch window and ord."""
    ordx = (
        f"(CAST(FLOOR(epoch({ts_col})) AS BIGINT) * 4294967296"
        f" + {id_col} % 4294967296)"
    )
    tset = ", ".join(f"'{t}'" for t in touches)
    return f"""
    WITH seq AS (
      SELECT {user_col}, {type_col},
             CAST(FLOOR({value_col} * 100) AS BIGINT) AS cents,
             {ordx} AS ord
      FROM {rel}
    ), tagged AS (
      SELECT *, FIRST_VALUE(
               CASE WHEN {type_col} IN ({tset}) THEN {type_col} END
               IGNORE NULLS) OVER (
               PARTITION BY {user_col} ORDER BY ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS first_touch
      FROM seq
    )
    SELECT COALESCE(first_touch, '(none)') AS first_touch,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(COUNT(DISTINCT {user_col}) AS BIGINT) AS n_users,
           CAST(SUM(cents) AS BIGINT) AS value_cents
    FROM tagged WHERE {type_col} = '{conversion}'
    GROUP BY 1
    """
