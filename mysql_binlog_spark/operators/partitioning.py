"""Scale-adaptive parallelism helpers (optimization guide §2).

``spread`` fixes the small-input corner of compute-heavy narrow stages:
a tiny parquet file scans as ONE task (``maxPartitionBytes`` cannot
split below file granularity), so an expression-heavy map stage —
per-shingle md5 in MinHash, per-pair dot products in kNN — runs on a
single core while the rest of the cluster idles.  Repartitioning to the
default parallelism costs one exchange of the (tiny) input and buys a
cluster-wide map stage.

The guard is what makes it scale-adaptive rather than a local[32] tune:
when the input's existing partitioning already meets the cluster's
parallelism (any real 100 TB scan), ``spread`` is a no-op and no
exchange is added.  The threshold derives from
``sparkContext.defaultParallelism`` at call time — never a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the cluster's default
    parallelism — only when its current partitioning is coarser.  Use
    immediately before an expression-heavy map stage whose input may be
    a small single-file scan; a no-op (zero plan change) on inputs that
    already have enough partitions."""
    if df.isStreaming:  # partition introspection needs a batch plan
        return df
    spark = df.sparkSession
    par = min_parallelism or spark.sparkContext.defaultParallelism
    # .rdd only plans (no job); cheap for the scan-shaped inputs this
    # guards, and the answer decides whether any exchange is added at all
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
