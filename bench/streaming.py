#!/usr/bin/env python
"""Streaming-scale replay bench (VERDICT round-2 #6): replay_stream over
the cached large binlog fixture, reporting sustained events/sec, plus a
mid-replay SIGKILL + resume proving streaming exactly-once at scale.

Protocol:
 1. sustained: fresh lake + checkpoint, Structured Streaming file source
    (availableNow, MAX_FILES files/trigger), foreachBatch applying the
    same decode → winners → MERGE epoch logic; wall time measured from
    stream start to drain (session startup excluded).
 2. kill/resume: a fresh lake replays in a SUBPROCESS that is SIGKILLed
    mid-replay (hard crash: no JVM shutdown, no commit-log flush beyond
    what's durable); the parent then resumes with the same checkpoint +
    lake and must converge to the identical final snapshot count, with
    retried epochs skipped by the idempotent commit log.

Writes BENCH/STREAMING.md.  Env: BENCH_AMP/BENCH_EPF (fixture tag, must
exist — run bench.py first), STREAM_MAX_FILES (default 360),
KILL_AFTER_SEC (default 25).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AMP = int(os.environ.get("BENCH_AMP", "720"))
EPF = int(os.environ.get("BENCH_EPF", "20000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MAX_FILES = int(os.environ.get("STREAM_MAX_FILES", "360"))
KILL_AFTER = float(os.environ.get("KILL_AFTER_SEC", "25"))

IMAGE_COLS = [
    ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
    ("text", "string"), ("tool", "string"), ("ts", "timestamp"),
    ("tool_version", "string"),
]

WORKER_SRC = r"""
import sys, tempfile
sys.path.insert(0, {repo!r})
from mysql_binlog_spark.session import get_spark
from mysql_binlog_spark.streaming.replay import replay_stream
from mysql_binlog_spark.table import LakeTable

chunks, lake_dir, ckpt = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark(app_name="stream-victim", master="local[{cpus}]",
                  shuffle_partitions={cpus},
                  extra_conf={{
                      "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
                      "spark.sql.files.openCostInBytes": str(1024 * 1024),
                  }})
spark.sparkContext.setLogLevel("ERROR")
table = LakeTable(lake_dir)
replay_stream(spark, chunks, table, ckpt,
              include=[("app", "transcripts")], image_cols={image_cols!r},
              max_files_per_trigger={max_files}, timeout_sec=36000)
"""


def fixture_dir() -> tuple[str, int]:
    tag = f"sf={os.path.basename(SF_DIR.rstrip('/'))}-amp={AMP}-epf={EPF}-v3"  # v3: 2-SID GTID fixtures
    d = os.path.join(tempfile.gettempdir(), "mbs_bench", tag)
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        raise SystemExit(f"fixture missing ({d}): run bench.py first")
    return d, json.load(open(marker))["rows"]


def main() -> None:
    from mysql_binlog_spark.session import get_spark
    from mysql_binlog_spark.streaming.replay import replay_stream
    from mysql_binlog_spark.table import LakeTable

    chunks, n_rows = fixture_dir()
    spark = get_spark(
        app_name="mbs-stream-bench", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def fresh() -> tuple[LakeTable, str]:
        lake = tempfile.mkdtemp(prefix="mbs_stream_lake_")
        t = LakeTable.create(
            lake, IMAGE_COLS[:6], ["conv_id", "turn_idx"], n_buckets=64
        )
        return t, tempfile.mkdtemp(prefix="mbs_stream_ckpt_")

    # 0. batch replay at the SAME epoch granularity — the fair comparator:
    # every full-key-coverage epoch rewrites all touched buckets, so the
    # meaningful streaming question is what the streaming machinery adds
    # over batch at equal epochs, not over a single-epoch batch run
    from mysql_binlog_spark.streaming.replay import replay_batch

    btable, _ = fresh()
    tb = time.time()
    replay_batch(
        spark, chunks, btable, include=[("app", "transcripts")],
        image_cols=IMAGE_COLS, files_per_epoch=MAX_FILES,
    )
    batch_wall = time.time() - tb
    batch_eps = n_rows / batch_wall
    print(f"# batch@{MAX_FILES}/epoch: {batch_wall:.1f}s "
          f"({batch_eps:,.0f} ev/s)", file=sys.stderr)

    # 1. sustained throughput (full drain)
    table, ckpt = fresh()
    t0 = time.time()
    stats = replay_stream(
        spark, chunks, table, ckpt, include=[("app", "transcripts")],
        image_cols=IMAGE_COLS, max_files_per_trigger=MAX_FILES,
        timeout_sec=36000,
    )
    wall = time.time() - t0
    final_count = table.snapshot_df(spark).count()
    eps = n_rows / wall
    n_epochs = stats.applied
    print(f"# sustained: {wall:.1f}s, {eps:,.0f} ev/s, "
          f"{n_epochs} epochs, final={final_count}", file=sys.stderr)

    # 2. hard-kill mid-replay, then resume
    table2, ckpt2 = fresh()
    worker = os.path.join(tempfile.mkdtemp(prefix="mbs_stream_"), "victim.py")
    with open(worker, "w") as f:
        f.write(WORKER_SRC.format(repo=REPO, cpus=CPUS,
                                  image_cols=IMAGE_COLS,
                                  max_files=MAX_FILES))
    p = subprocess.Popen(
        [sys.executable, worker, chunks, table2.path, ckpt2],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    time.sleep(KILL_AFTER)
    p.send_signal(signal.SIGKILL)
    p.wait()
    t2 = LakeTable(table2.path)  # fresh instance: caches rebuilt from disk
    epochs_before_resume = len(t2.committed_epochs())
    t_resume = time.time()
    stats2 = replay_stream(
        spark, chunks, t2, ckpt2, include=[("app", "transcripts")],
        image_cols=IMAGE_COLS, max_files_per_trigger=MAX_FILES,
        timeout_sec=36000,
    )
    resume_wall = time.time() - t_resume
    resumed_count = t2.snapshot_df(spark).count()
    skipped = sum(1 for e in stats2.epochs if e.get("skipped"))
    ok = resumed_count == final_count
    print(f"# resume: killed after {KILL_AFTER}s with "
          f"{epochs_before_resume} epochs committed; resume {resume_wall:.1f}s,"
          f" {skipped} retried epochs skipped, final={resumed_count} "
          f"(match={ok})", file=sys.stderr)

    doc = {
        "events_total": n_rows,
        "cpus": CPUS,
        "max_files_per_trigger": MAX_FILES,
        "batch_same_granularity": {
            "wall_sec": round(batch_wall, 1),
            "events_per_sec": round(batch_eps, 1),
        },
        "stream_over_batch_ratio": round(wall / batch_wall, 3),
        "sustained": {
            "wall_sec": round(wall, 1),
            "events_per_sec": round(eps, 1),
            "epochs": n_epochs,
            "final_rows": final_count,
        },
        "kill_resume": {
            "killed_after_sec": KILL_AFTER,
            "epochs_committed_at_kill": epochs_before_resume,
            "resume_wall_sec": round(resume_wall, 1),
            "retried_epochs_skipped": skipped,
            "final_rows": resumed_count,
            "matches_uninterrupted_run": ok,
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "STREAMING.md"), "w") as f:
        f.write(f"""# STREAMING — Structured Streaming replay at scale

``replay_stream`` (file-source ``availableNow``, {MAX_FILES} chunk files
per trigger, foreachBatch → decode → winners → idempotent lake MERGE)
over the same {n_rows:,}-event binary log the batch bench uses, at
local[{CPUS}].

| metric | value |
|---|---|
| sustained wall (drain) | {wall:.1f} s |
| sustained throughput | {eps:,.0f} events/s |
| micro-batch epochs | {n_epochs} |
| final snapshot rows | {final_count:,} |
| batch replay at the SAME epoch granularity | {batch_wall:.1f} s ({batch_eps:,.0f} ev/s) |
| streaming / batch wall ratio | **{wall / batch_wall:.2f}×** |

Epoch granularity dominates both paths: uniform keys mean every epoch
rewrites every bucket — the worst case for incremental MERGE
(production epochs touch a small bucket fraction and prune).  Note the
batch comparator pipelines one epoch deep (round 5), which foreachBatch
cannot — the ratio includes that asymmetry, not just streaming
machinery.

## Hard-kill mid-replay + resume (exactly-once)

A separate replay process was SIGKILLed {KILL_AFTER:.0f}s in (no JVM
shutdown, {epochs_before_resume} epochs durably committed).  Resuming
with the same checkpoint + lake:

| metric | value |
|---|---|
| resume wall | {resume_wall:.1f} s |
| retried epochs skipped by commit log | {skipped} |
| final snapshot rows | {resumed_count:,} |
| equals uninterrupted run | **{ok}** |

```json
{json.dumps(doc, indent=2)}
```
""")
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
