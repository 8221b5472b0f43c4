"""spread(): scale-adaptive widen for compute-heavy narrow stages —
widen single-partition scans to the cluster parallelism, never touch an
input that is already wide enough (the 100 TB no-op guarantee)."""

from __future__ import annotations

from mysql_binlog_spark.operators.partitioning import spread


def test_spread_widens_narrow_input(spark):
    df = spark.range(100).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread(df)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # row set unchanged
    assert sorted(r.id for r in out.collect()) == list(range(100))


def test_spread_is_noop_on_wide_input(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(par + 3)
    out = spread(df)
    # no extra exchange: the plan object is returned unchanged
    assert out is df


def test_spread_respects_explicit_parallelism(spark):
    df = spark.range(10).coalesce(1)
    assert spread(df, min_parallelism=4).rdd.getNumPartitions() == 4
