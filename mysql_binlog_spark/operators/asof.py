"""Point-in-time (as-of) join — CDC state lookup at an arbitrary LSN.

The op Spark's join syntax lacks (the task brief's canonical example):
for every probe row, find the LATEST state row with
``state.order <= probe.order`` on the same key.  The naive encoding —
``probes JOIN states ON key AND s.ord <= p.ord`` + a max window — is an
inequality join Catalyst executes as BroadcastNestedLoopJoin (O(P·S)
comparisons per key) and then shuffles again to pick the max.  At CDC
scale (states = the whole changelog) that plan is quadratic in the hot
keys and unusable.

This implementation is the linear composition instead:

  1. UNION states (tagged 0) and probes (tagged 1) by name;
  2. ONE shuffle: window partitioned by key, ordered by
     (order, tag) — the tag orders a state at the exact probe position
     BEFORE the probe, making the join inclusive (<=);
  3. ``last(state_struct, ignoreNulls=true)`` over
     rows UNBOUNDED PRECEDING..CURRENT — each probe picks up the most
     recent state in one running pass;
  4. keep probe rows, explode the struct.

Cost: one hash-partition by key + a sort within partitions — the same
shape as the dedup/last-writer stages, so it scales exactly as they do
(salt the hot keys upstream if needed).  The payload travels as ONE
struct column, not per-column ``last(ignoreNulls)`` calls: a state row
whose individual payload field is legitimately NULL must NOT backfill
that field from an older state (struct-nullity is row-nullity, the
fields inside stay as written).

The DuckDB oracle runs a genuinely different algorithm — the native
``ASOF LEFT JOIN`` operator — so the parity gate cross-checks two
independent as-of implementations.

Reference: the PHP reference has no temporal-join surface (it stops at
the event stream); this is engine-side analytics over its output,
SURVEY §2.11 family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_is_probe"
_STATE = "__asof_state"


def asof_join(
    probes: DataFrame,
    states: DataFrame,
    key_cols: list[str],
    order_col: str,
    payload_cols: list[str],
    prefix: str = "m_",
) -> DataFrame:
    """Backward as-of join (inclusive): each probe row gains
    ``<prefix><payload_col>`` columns from the latest state row at
    ``state.order_col <= probe.order_col`` on the same key (NULLs when
    no state precedes the probe), plus ``<prefix><order_col>`` with the
    matched state's position.

    ``states`` must be unique per (key, order) — CDC changelogs are,
    by LSN.  Probe columns are carried through untouched.
    """
    carry = [c for c in probes.columns]
    s = states.select(
        *key_cols,
        F.col(order_col),
        F.lit(0).alias(_TAG),
        F.struct(
            F.col(order_col).alias(order_col),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias(_STATE),
        *[
            F.lit(None).cast(probes.schema[c].dataType).alias(c)
            for c in carry
            if c not in key_cols and c != order_col
        ],
    )
    p = probes.select(
        *key_cols,
        F.col(order_col),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(s.schema[_STATE].dataType).alias(_STATE),
        *[c for c in carry if c not in key_cols and c != order_col],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col), F.col(_TAG))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_STATE, ignorenulls=True).over(w)
    out = (
        s.unionByName(p)
        .withColumn(_STATE, matched)
        .where(F.col(_TAG) == 1)
        .drop(_TAG)
    )
    picks = [F.col(f"{_STATE}.{order_col}").alias(f"{prefix}{order_col}")] + [
        F.col(f"{_STATE}.{c}").alias(f"{prefix}{c}") for c in payload_cols
    ]
    return out.select(*carry, *picks)
