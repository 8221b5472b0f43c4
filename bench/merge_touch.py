#!/usr/bin/env python
"""Incremental-MERGE bench at production epoch shape (round-3 verdict
#6): BENCH/STREAMING.md's epochs update uniformly-spread keys — every
epoch rewrites every bucket, the worst case.  Real CDC increments touch
a handful of hot conversations, i.e. a few hash buckets; the manifest's
bucket pruning should make per-epoch wall track the TOUCHED buckets,
not the table size.

Protocol: build a lake of ``MERGE_CONVS`` conversations × ``TURNS``
turns (one full initial epoch), then apply update epochs of a CONSTANT
row count (``CONVS_PER_EPOCH`` conversations × all turns) whose
conversations are chosen so the epoch lands in exactly B ∈ {1, 4, 16,
64} buckets (conv ids are picked by their pmod(xxhash64, n_buckets)
bucket — the same expression LakeTable buckets by).  Same data volume
per epoch, only the bucket spread varies.  Wall ∝ B confirms the MERGE
rewrites only touched buckets.

Writes BENCH/MERGE.md.  Usage: python bench/merge_touch.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MERGE_CONVS = int(os.environ.get("MERGE_CONVS", "40000"))
TURNS = int(os.environ.get("MERGE_TURNS", "50"))
CONVS_PER_EPOCH = int(os.environ.get("MERGE_CONVS_PER_EPOCH", "256"))
N_BUCKETS = 64
BUCKET_SERIES = [1, 4, 16, 64]
COLUMNS = [
    ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
    ("text", "string"), ("tool", "string"), ("ts", "timestamp"),
]


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mysql_binlog_spark.session import get_spark
    from mysql_binlog_spark.table import LakeTable

    spark = get_spark(app_name="merge-touch-bench",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    convs = spark.sql(f"""
        SELECT printf('conv_%07d', id) AS conv_id,
               CAST(pmod(xxhash64(printf('conv_%07d', id)), {N_BUCKETS})
                    AS INT) AS bucket
        FROM range({MERGE_CONVS})
    """).persist()

    def rows_for(conv_df, tag: str):
        return conv_df.crossJoin(
            spark.range(TURNS).select(F.col("id").cast("int").alias("turn_idx")),
        ).select(
            "conv_id", "turn_idx",
            F.lit("update").alias("action"),
            F.lit("assistant").alias("role"),
            F.concat(F.lit(f"{tag} text of "), "conv_id", F.lit(" turn "),
                     F.col("turn_idx")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
            F.monotonically_increasing_id().alias("log_pos"),
            F.lit("binlog.000001").alias("log_file"),
            F.lit(0).cast("long").alias("batch_seq"),
            F.lit(1).cast("long").alias("server_id"),
        )

    lake = tempfile.mkdtemp(prefix="mbs_merge_bench_")
    table = LakeTable.create(lake, COLUMNS, ["conv_id", "turn_idx"],
                             n_buckets=N_BUCKETS)
    t0 = time.time()
    table.merge_into(spark, rows_for(convs.select("conv_id"), "base"),
                     "epoch-base")
    base_wall = time.time() - t0
    total_rows = MERGE_CONVS * TURNS
    print(f"# base load {total_rows:,} rows in {base_wall:.1f}s",
          file=sys.stderr)

    # one untimed warm epoch so the first measured cell doesn't pay
    # post-load JIT/manifest warm-up
    warm_sel = (
        convs.filter(F.col("bucket") == N_BUCKETS - 1)
        .limit(CONVS_PER_EPOCH // 4).select("conv_id")
    )
    table.merge_into(spark, rows_for(warm_sel, "warm"), "epoch-warm")

    results = []
    for b in BUCKET_SERIES:
        # CONSTANT row volume: CONVS_PER_EPOCH convs confined to buckets
        # [0, b) — rank-within-bucket keeps per-bucket counts balanced
        sel = (
            convs.filter(F.col("bucket") < b)
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("bucket").orderBy("conv_id")
                ),
            )
            .filter(F.col("rk") <= CONVS_PER_EPOCH // b)
            .select("conv_id")
        )
        upd = rows_for(sel, f"update-b{b}")
        n_upd = upd.count()  # materialize the input before timing
        t0 = time.time()
        commit = table.merge_into(spark, upd, f"epoch-touch-{b}")
        wall = time.time() - t0
        results.append({
            "target_buckets": b,
            "touched_buckets": commit.get("touched_buckets"),
            "update_rows": n_upd,
            "wall_sec": round(wall, 2),
        })
        print(f"# touch {b:3d} buckets "
              f"(commit says {commit.get('touched_buckets')}), "
              f"{n_upd:,} rows: {wall:.2f}s", file=sys.stderr)

    w1 = results[0]["wall_sec"]
    w64 = results[-1]["wall_sec"]
    doc = {
        "table_rows": total_rows,
        "n_buckets": N_BUCKETS,
        "update_rows_per_epoch": results[0]["update_rows"],
        "base_full_load_sec": round(base_wall, 2),
        "epochs": results,
        "wall_ratio_64_vs_1_buckets": round(w64 / w1, 2),
    }
    rows_md = "\n".join(
        f"| {r['target_buckets']} | {r['update_rows']:,} | "
        f"{r['wall_sec']:.2f} |"
        for r in results
    )
    with open(os.path.join(REPO, "BENCH", "MERGE.md"), "w") as f:
        f.write(f"""# MERGE — bucket-pruned incremental epochs

Lake of {total_rows:,} rows ({MERGE_CONVS:,} conversations ×
{TURNS} turns, {N_BUCKETS} hash buckets).  Each epoch updates the SAME
row volume (~{results[0]['update_rows']:,} rows) but confines it to a
varying number of hash buckets — the production CDC shape where a few
hot conversations burst.

| touched buckets | update rows | epoch wall s |
|---|---|---|
{rows_md}

Full initial load ({total_rows:,} rows, all {N_BUCKETS} buckets):
{base_wall:.1f}s.  Wall at 64 touched buckets is
{doc['wall_ratio_64_vs_1_buckets']}× the 1-bucket epoch at identical
update volume — per-epoch cost follows the buckets the manifest must
rewrite, not the table size (bucket pruning at the file level,
table.py manifest design).

```json
{json.dumps(doc, indent=2)}
```
""")
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
