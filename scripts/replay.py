#!/usr/bin/env python
"""CLI replay driver — the spark-submit face of the engine.

Mirrors the reference's configuration surface (Config::fromEnv/fromArgs,
src/Config.php:21-171: binlog file/position, table and database
include/exclude lists, server id, statistics interval) mapped onto the
Spark replay:

    spark-submit --py-files mysql_binlog_spark.zip scripts/replay.py \\
        --chunk-dir /data/binlog --table-dir /lake/transcripts \\
        --mode stream --checkpoint /ckpt/transcripts \\
        --databases app --tables transcripts \\
        --binlog-file binlog.000007 --binlog-position 4

Every option also reads from env (TABLES, DATABASES, BINLOG_FILE,
BINLOG_POSITION, SERVER_ID, STATISTICS_INTERVAL) like the reference.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_binlog_spark.session import get_spark  # noqa: E402
from mysql_binlog_spark.streaming.replay import replay_batch, replay_stream  # noqa: E402
from mysql_binlog_spark.table import LakeTable  # noqa: E402

DEFAULT_COLUMNS = [
    ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
    ("text", "string"), ("tool", "string"), ("ts", "timestamp"),
]


def _split(v: str | None) -> list[str]:
    return [x.strip() for x in v.split(",") if x.strip()] if v else []


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    env = os.environ.get
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--chunk-dir", required=True)
    p.add_argument("--table-dir", required=True)
    p.add_argument("--mode", choices=["batch", "stream"], default="batch")
    p.add_argument("--checkpoint", default=env("CHECKPOINT"))
    p.add_argument("--tables", default=env("TABLES", "transcripts"))
    p.add_argument("--exclude-tables", default=env("EXCLUDE_TABLES"))
    p.add_argument("--databases", default=env("DATABASES", "app"))
    p.add_argument("--exclude-databases", default=env("EXCLUDE_DATABASES"))
    p.add_argument("--binlog-file", default=env("BINLOG_FILE"))
    p.add_argument("--start-after-gtid", default=env("START_AFTER_GTID"),
                   help="resume-by-GTID set: 'sid:gno[,sid:gno...]' — "
                        "skip transactions of each listed SID with "
                        "GNO <= its threshold (SIDs are case-folded)")
    p.add_argument("--binlog-position", type=int,
                   default=int(env("BINLOG_POSITION", "0")))
    p.add_argument("--files-per-epoch", type=int, default=8)
    p.add_argument("--on-error", choices=["raise", "skip"],
                   default=env("ON_ERROR", "raise"),
                   help="skip: quarantine posture -- drop corrupt chunks "
                        "whole instead of failing the replay (pair with "
                        "--verify-crc; see validate_chunks for the report)")
    p.add_argument("--verify-crc", action="store_true",
                   default=env("VERIFY_CRC", "") == "1",
                   help="checksum every frame during decode (corruption "
                        "that doesn't break framing is only detectable "
                        "by CRC)")
    p.add_argument("--merge-mode", choices=["cow", "mor"],
                   default=env("MERGE_MODE", "cow"),
                   help="cow: rewrite touched buckets per epoch (merge-"
                        "free reads); mor: append delta files (O(epoch-"
                        "changes) writes, reads resolve by LSN; compact "
                        "folds — see BENCH/MERGE.md)")
    p.add_argument("--key", default="conv_id,turn_idx")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def _filter_entries(
    dbs: list[str], tables: list[str], qualify_against: list[str] | None = None
) -> list:
    """Reference Config semantics: ``databases`` are schema-level entries,
    ``tables`` are 'db.table' qualified names (a bare table name is
    qualified against each database in ``qualify_against`` — defaulting
    to ``dbs`` — for convenience).  Both dimensions apply independently
    (EventsIterator.php:103-130): a databases-only list admits every
    table of those schemas — no table list required.

    For EXCLUDES, pass the INCLUDE databases as ``qualify_against``: a
    bare ``--exclude-tables`` name means 'exclude table T within the
    included databases' — qualifying it against ``--exclude-databases``
    would be a no-op, since a db-level exclude already rejects every
    table of that schema (ADVICE round-4)."""
    qual = qualify_against if qualify_against is not None else dbs
    out: list = list(dbs)
    for t in tables:
        if "." in t:
            s, tb = t.split(".", 1)
            out.append((s, tb))
        elif qual:
            out.extend((db, t) for db in qual)
        else:
            raise SystemExit(
                f"table filter {t!r} is unqualified and no databases are "
                "configured; use db.table"
            )
    return out


def main(argv: list[str] | None = None) -> dict:
    a = parse_args(argv)
    include = _filter_entries(_split(a.databases), _split(a.tables)) or None
    exclude = _filter_entries(
        _split(a.exclude_databases), _split(a.exclude_tables),
        qualify_against=_split(a.databases),
    ) or None
    # start LSN (reference Config: binlogFile/binlogPosition) — threaded
    # into the decode source's file pruning + in-chunk position skip
    start_lsn = (a.binlog_file, a.binlog_position) if a.binlog_file else None
    start_gtid = None
    if a.start_after_gtid:
        from mysql_binlog_spark.wire import parse_gtid_set

        try:
            # lowercases + shape-validates each SID (ADVICE round-5: an
            # uppercase UUID used to silently skip zero transactions)
            start_gtid = parse_gtid_set(a.start_after_gtid)
        except ValueError as e:
            raise SystemExit(f"--start-after-gtid: {e}") from None
    spark = get_spark(app_name="mbs-replay", master=a.master)
    table = LakeTable.create(
        a.table_dir, DEFAULT_COLUMNS, _split(a.key), n_buckets=a.n_buckets
    )
    if a.mode == "stream":
        if not a.checkpoint:
            raise SystemExit("--checkpoint required for stream mode")
        stats = replay_stream(
            spark, a.chunk_dir, table, a.checkpoint, include=include,
            exclude=exclude,
            max_files_per_trigger=a.files_per_epoch, start_lsn=start_lsn,
            start_after_gtid=start_gtid, merge_mode=a.merge_mode,
            on_error=a.on_error, verify_crc=a.verify_crc,
        )
    else:
        stats = replay_batch(
            spark, a.chunk_dir, table, include=include, exclude=exclude,
            files_per_epoch=a.files_per_epoch, start_lsn=start_lsn,
            start_after_gtid=start_gtid, merge_mode=a.merge_mode,
            on_error=a.on_error, verify_crc=a.verify_crc,
        )
    summary = {
        "mode": a.mode,
        "epochs_applied": stats.applied,
        "epochs_skipped": len(stats.epochs) - stats.applied,
        "final_rows": table.snapshot_df(spark).count(),
        "schema_version": table.schema_doc()["version"],
        "last_lineage": (stats.epochs[-1].get("lineage")
                         if stats.epochs else None),
    }
    print(json.dumps(summary))
    spark.stop()
    return summary


if __name__ == "__main__":
    main()
