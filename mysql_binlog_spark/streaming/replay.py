"""Replay drivers: recorded binlog chunks → lake table.

Two paths, same apply logic (SURVEY.md §3.3 lifecycle):

* ``replay_batch`` — groups chunk files into epochs in natural-sort order
  (the reference's binlog-file ordering, Connection.php:120), decodes each
  group, reduces to per-key winners and merges.  Resumable: committed
  epoch ids are skipped, so re-running after a crash continues where the
  commit log stopped (north-rule A5/A6 — the commit log *is* the
  checkpoint).
* ``replay_stream`` — Structured Streaming over the chunk directory
  (file source, ``maxFilesPerTrigger``), ``foreachBatch`` applying the same
  batch logic with the streaming epoch id; Spark's checkpointLocation
  provides offset tracking, our idempotent commits make retried batches
  exactly-once.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.apply import last_writer
from ..sources.binlog import image_view, read_binlog
from ..table import LakeTable

# Meta columns the apply path provably never reads (winners carry only
# key + payload + LSN + action; lineage reads log_file/log_pos):
# read_binlog emits them as all-NULL — same schema, ~300 MB less Arrow
# IPC + JVM row conversion per 5.8 M events (guide §4).
_PRUNED_META = frozenset({"event_ts", "schema_name", "table_name", "gtid"})


@dataclass
class ReplayStats:
    epochs: list[dict] = field(default_factory=list)

    @property
    def applied(self) -> int:
        return sum(1 for e in self.epochs if not e.get("skipped"))


def _epoch_winners(
    table: LakeTable,
    decoded,
    include: list | None,
    image_cols: list[str],
    exclude: list | None = None,
):
    """The table-state-INDEPENDENT half of an epoch: decode (which
    already applied the include/exclude filter IN-KERNEL — both replay
    drivers build ``decoded`` with the same sets, so a second
    ``filter_tables`` here would only re-test schema_name/table_name on
    rows the kernel already admitted; round 7 removes it, which also
    lets the decode null those columns, see ``read_binlog(null_cols)``)
    → image → per-key winners.  Safe to run ahead of the previous
    epoch's merge/commit (see replay_batch's one-deep pipeline)."""
    df = decoded
    # NB: no dedup_lsn stage here — exact re-deliveries share both LSN and
    # payload, so max_by in last_writer picks an identical row either way;
    # an explicit dropDuplicates would only add a second full-width shuffle.
    # (dedup_lsn remains a standalone operator for stats/count paths.)
    df = image_view(df, image_cols)
    return last_writer(
        df, key_cols=table.key_cols,
        payload_cols=[c for c in image_cols if c not in table.key_cols],
    )


def _apply_epoch(
    spark: SparkSession,
    table: LakeTable,
    decoded,
    epoch_id: str,
    include: list | None,
    image_cols: list[str],
    exclude: list | None = None,
    merge_mode: str = "cow",
) -> dict:
    winners = _epoch_winners(table, decoded, include, image_cols, exclude)
    return table.merge_into(spark, winners, epoch_id, mode=merge_mode)


def replay_batch(
    spark: SparkSession,
    chunk_dir: str,
    table: LakeTable,
    include: list | None = None,
    exclude: list | None = None,
    image_cols: list[tuple[str, str]] | None = None,
    files_per_epoch: int = 4,
    stop_after_epochs: int | None = None,
    start_lsn: tuple[str, int] | None = None,
    start_after_gtid: tuple[str, int] | dict[str, int] | None = None,
    maintain_every: int | None = 16,
    pipeline: bool = True,
    merge_mode: str = "cow",
    on_error: str = "raise",
    verify_crc: bool = False,
) -> ReplayStats:
    """Batch replay with epoch granularity = ``files_per_epoch`` chunks.

    ``merge_mode='mor'`` applies epochs as merge-on-read deltas
    (LakeTable.merge_into mode) — O(epoch changes) write cost per epoch;
    pair with ``maintain_every`` so compaction bounds read fan-in.

    ``on_error='skip'`` — quarantine posture for long replays: a corrupt
    chunk is dropped whole by the decode source instead of killing the
    replay; pair with ``verify_crc=True`` (corruption that doesn't
    break framing is only detectable by checksum) and run
    ``sources.binlog.validate_chunks`` for the report of what was
    dropped and why.  Backfill after repair: the quarantined chunk's
    epoch is already committed, so re-running skips it — replay the
    repaired chunk from its own directory instead (fresh epoch id;
    last-writer-wins by LSN makes the late merge order-independent, so
    the table converges to the full-replay state —
    test_backfill_repaired_chunk_after_quarantine).

    ``pipeline=False`` disables the one-deep epoch prefetch (strictly
    serial epochs — deterministic job ordering for debugging and the
    A/B control in BENCH/ANALYSIS.md).

    ``stop_after_epochs`` simulates a mid-replay crash for resume tests.
    ``start_after_gtid`` = (sid uuid, gno): resume-by-GTID — skip every
    transaction of that SID with GNO ≤ gno (pushed into the decode
    kernels; file-level pruning still needs ``start_lsn``).
    ``start_lsn`` = (binlog_file, position): chunks before the file are
    pruned from the epoch plan entirely; events before the position inside
    the start file are skipped by the decode source (reference's
    start-position semantics, EventsIterator.php:207-215).
    ``maintain_every``: run ``table.maintain()`` (vacuum superseded epoch
    files; compact if buckets fragmented) after every N applied epochs,
    so a 10⁴-epoch replay's disk footprint stays bounded without a manual
    maintenance pass; None disables.
    """
    from concurrent.futures import ThreadPoolExecutor

    chunks = sorted(
        f for f in os.listdir(chunk_dir)
        if f.startswith("binlog.") and not f.endswith(".json")
    )
    if start_lsn is not None:
        chunks = [f for f in chunks if f >= start_lsn[0]]
    include_set = set(include) if include is not None else None
    exclude_set = set(exclude) if exclude is not None else None
    stats = ReplayStats()
    done = table.committed_epochs()
    groups = [
        chunks[i : i + files_per_epoch]
        for i in range(0, len(chunks), files_per_epoch)
    ]
    # One ordered plan: skipped entries are recorded lazily in the main
    # loop so stats.epochs preserves chronological group order (ADVICE
    # round-5: the pre-pass batched every skipped epoch ahead of the
    # applied ones, changing the epoch-log contract).
    plan = []
    for group in groups:
        epoch_id = f"batch-{group[0]}-{group[-1]}"
        plan.append((epoch_id, group, epoch_id in done))
    todo = [(eid, g) for eid, g, skipped in plan if not skipped]

    def prepare(group, materialize: bool = True):
        """Build the epoch's winners plan (decode → filter → image →
        last_writer) — every bit of it independent of table state.

        ``materialize=True`` (the PREFETCHED epoch) persists + counts so
        the work runs while the PREVIOUS epoch merges/commits.
        ``materialize=False`` (round 7): an epoch consumed inline with
        nothing to overlap returns the LAZY plan — merge_into's fused
        single-pass path (MOR / initial load) then runs decode → winners
        → write as ONE job instead of paying a full cache
        materialization first."""
        paths = [os.path.join(chunk_dir, f) for f in group]
        decoded = read_binlog(
            spark, paths, image_cols=image_cols, include=include_set,
            exclude=exclude_set, start_lsn=start_lsn,
            start_after_gtid=start_after_gtid,
            before_mode="delete_only",  # apply never reads update befores
            on_error=on_error, verify_crc=verify_crc,
            null_cols=_PRUNED_META,  # apply never reads these either
        )
        cols = (
            [n for n, _ in image_cols]
            if image_cols
            else [f.name[len("after_"):] for f in decoded.schema.fields
                  if f.name.startswith("after_")]
        )
        w = _epoch_winners(table, decoded, include, cols, exclude)
        if materialize:
            w = w.persist()
            w.count()
        return w

    # One-deep epoch pipeline (round-5 width fix): while epoch N's merge
    # shuffles/writes and its manifest commits (serial driver JSON I/O +
    # a driver-side lineage collect), epoch N+1's decode jobs run from a
    # second submitter thread and fill the idle cores of N's stage tails.
    # FIFO scheduling gives N's tasks priority; N+1 only uses slack.
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = None
        ti = 0  # index of the NEXT todo entry once this one is taken
        try:
            for epoch_id, group, skipped in plan:
                if skipped:
                    stats.epochs.append(
                        {"epoch_id": epoch_id, "skipped": True}
                    )
                    continue
                # an inline-prepared epoch (nothing running concurrently
                # to overlap with) stays lazy so merge_into can fuse
                # decode → winners → write into one job
                w = (
                    fut.result()
                    if fut is not None
                    else prepare(group, materialize=False)
                )
                ti += 1
                fut = (
                    pool.submit(prepare, todo[ti][1])
                    if pipeline and ti < len(todo)
                    else None
                )
                stats.epochs.append(
                    table.merge_into(spark, w, epoch_id, mode=merge_mode)
                )
                w.unpersist(blocking=False)
                if maintain_every and stats.applied % maintain_every == 0:
                    table.maintain(spark)
                if (
                    stop_after_epochs is not None
                    and stats.applied >= stop_after_epochs
                ):
                    break
        finally:
            if fut is not None:  # stop/crash: drop the prefetched epoch
                try:
                    fut.result().unpersist(blocking=False)
                except Exception:
                    pass
    return stats


def replay_stream(
    spark: SparkSession,
    chunk_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    include: list | None = None,
    exclude: list | None = None,
    image_cols: list[tuple[str, str]] | None = None,
    max_files_per_trigger: int = 4,
    timeout_sec: float = 300.0,
    start_lsn: tuple[str, int] | None = None,
    start_after_gtid: tuple[str, int] | dict[str, int] | None = None,
    maintain_every: int | None = 16,
    merge_mode: str = "cow",
    on_error: str = "raise",
    verify_crc: bool = False,
) -> ReplayStats:
    """Structured Streaming replay over the chunk directory.

    The stream carries file *references* (path + length) — cheap state —
    and ``foreachBatch`` re-reads the binary content for decode, keeping
    the streaming source small and the decode fully partition-parallel.
    Runs until the directory is drained (availableNow trigger).
    ``merge_mode='mor'`` applies each micro-batch as merge-on-read
    deltas — the low-latency ingest shape (tiny triggers no longer pay a
    bucket rewrite); ``maintain_every`` bounds the read fan-in.
    """
    stats = ReplayStats()
    include_set = set(include) if include is not None else None
    exclude_set = set(exclude) if exclude is not None else None

    # file-reference stream: one row per chunk file
    refs = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "binlog.*[0-9]")
        .load(chunk_dir)
        .select("path")
    )

    def apply_batch(batch_df, batch_id: int):
        paths = [r["path"] for r in batch_df.collect()]
        if start_lsn is not None:
            paths = [p for p in paths if os.path.basename(p) >= start_lsn[0]]
        if not paths:
            return
        epoch_id = f"stream-{batch_id}-{os.path.basename(sorted(paths)[0])}"
        decoded = read_binlog(
            spark, paths, image_cols=image_cols, include=include_set,
            exclude=exclude_set, start_lsn=start_lsn,
            start_after_gtid=start_after_gtid,
            before_mode="delete_only",  # apply never reads update befores
            on_error=on_error, verify_crc=verify_crc,
            null_cols=_PRUNED_META,  # apply never reads these either
        )
        cols = (
            [n for n, _ in image_cols]
            if image_cols
            else [f.name[len("after_"):] for f in decoded.schema.fields
                  if f.name.startswith("after_")]
        )
        stats.epochs.append(
            _apply_epoch(spark, table, decoded, epoch_id, include, cols,
                         exclude, merge_mode=merge_mode)
        )
        if maintain_every and stats.applied % maintain_every == 0:
            table.maintain(spark)

    q = (
        refs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return stats
