"""As-of join (operators/asof.py): semantics + plan shape.

The driver oracle (`cdc_asof_lookup`) cross-checks the union+window
implementation against DuckDB's NATIVE ASOF LEFT JOIN at sf0.01; these
tests pin the fine-grained semantics the hash gate can't localize."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_binlog_spark.operators.asof import asof_join


def _states(spark):
    # key 'a': versions at ord 10 (text=x, tool=t1), 20 (text=y, tool=NULL)
    # key 'b': one version at ord 15
    return spark.createDataFrame(
        [
            ("a", 10, "x", "t1"),
            ("a", 20, "y", None),
            ("b", 15, "z", "t2"),
        ],
        "k string, ord int, text string, tool string",
    )


def _probe(spark, rows):
    return spark.createDataFrame(rows, "k string, ord int")


def test_asof_backward_inclusive_and_no_match(spark):
    probes = _probe(spark, [("a", 9), ("a", 10), ("a", 19), ("a", 25), ("b", 14)])
    out = asof_join(
        probes, _states(spark), ["k"], "ord", ["text", "tool"]
    ).collect()
    got = {(r["k"], r["ord"]): (r["m_ord"], r["m_text"], r["m_tool"]) for r in out}
    assert got[("a", 9)] == (None, None, None)      # nothing precedes
    assert got[("a", 10)] == (10, "x", "t1")        # inclusive at equal ord
    assert got[("a", 19)] == (10, "x", "t1")
    assert got[("b", 14)] == (None, None, None)     # other key's state invisible


def test_asof_null_payload_field_is_not_backfilled(spark):
    # The ord-20 state has tool=NULL; a naive per-column last(ignoreNulls)
    # would backfill tool='t1' from ord 10.  The struct carry must not.
    probes = _probe(spark, [("a", 25)])
    (row,) = asof_join(
        probes, _states(spark), ["k"], "ord", ["text", "tool"]
    ).collect()
    assert (row["m_ord"], row["m_text"], row["m_tool"]) == (20, "y", None)


def test_asof_carries_probe_columns(spark):
    probes = spark.createDataFrame(
        [("a", 25, "p1")], "k string, ord int, tag string"
    )
    (row,) = asof_join(
        probes, _states(spark), ["k"], "ord", ["text"]
    ).collect()
    assert row["tag"] == "p1" and row["m_text"] == "y"


def test_asof_plan_is_linear_not_nested_loop(spark):
    from tests.test_plans import plan

    probes = _probe(spark, [("a", 25)])
    p = plan(asof_join(probes, _states(spark), ["k"], "ord", ["text", "tool"]))
    # the whole point: NOT an inequality join
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # one hash-partition by key feeds the running window — same shuffle
    # shape as dedup/last-writer (formatted plans print each node twice:
    # once in the tree, once in the detail section)
    import re

    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "Window" in p
