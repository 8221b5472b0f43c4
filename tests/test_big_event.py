"""Multi-MB row events through the full engine path (VERDICT round-1
missing #6): a 3 MB BLOB (4-byte length prefix) decodes through the
DataFrame source and survives a lake MERGE — the seam the chunk framing
replaced (the reference's ≥16 MB multi-packet stitch,
Connection.php:394-417)."""

from __future__ import annotations

import os
import tempfile

from mysql_binlog_spark.sources.binlog import image_view, read_binlog
from mysql_binlog_spark.table import LakeTable
from mysql_binlog_spark.wire import (
    TYPE_BLOB,
    TYPE_LONG,
    TYPE_VARCHAR,
    BinlogWriter,
    TableSchema,
    WireColumn,
    decode_chunk,
)

BIG = ("x" * 1_000_000 + "é✓") * 3  # ~3 MB utf-8, multibyte tail


def _schema():
    return TableSchema(
        "app", "blobs",
        [
            WireColumn("id", TYPE_LONG, nullable=False),
            WireColumn("body", TYPE_BLOB, meta=4),  # 4-byte length prefix
            WireColumn("tag", TYPE_VARCHAR, meta=32),
        ],
        (0,), 300,
    )


def _chunk_dir() -> str:
    out = tempfile.mkdtemp(prefix="mbs_bigevent_")
    t = _schema()
    w = BinlogWriter()
    w.write_table_map(0, t)
    w.write_rows(0, t, "insert", [
        {"id": 1, "body": BIG, "tag": "big"},
        {"id": 2, "body": "small", "tag": "s"},
    ])
    w.write_rows(0, t, "update", [{"id": 1, "body": BIG + "v2", "tag": "big"}],
                 befores=[{"id": 1, "body": BIG, "tag": "big"}])
    with open(os.path.join(out, "binlog.000001"), "wb") as f:
        f.write(w.getvalue())
    return out


def test_big_blob_codec_roundtrip():
    t = _schema()
    w = BinlogWriter()
    w.write_table_map(0, t)
    w.write_rows(0, t, "insert", [{"id": 1, "body": BIG, "tag": "big"}])
    b = decode_chunk(w.getvalue(), verify_crc=True)
    assert b.after[0]["body"] == BIG


def test_big_blob_through_decode_and_merge(spark):
    chunks = _chunk_dir()
    cols = [("id", "int"), ("body", "string"), ("tag", "string")]
    dec = read_binlog(
        spark, os.path.join(chunks, "binlog.*[0-9]"), image_cols=cols
    )
    img = image_view(dec, [n for n, _ in cols])

    from mysql_binlog_spark.operators.apply import last_writer

    winners = last_writer(img, ["id"], ["body", "tag"])
    table = LakeTable.create(
        tempfile.mkdtemp(prefix="mbs_biglake_"), cols, ["id"], n_buckets=2
    )
    table.merge_into(spark, winners, "big-epoch")
    got = {r["id"]: r["body"] for r in table.snapshot_df(spark).collect()}
    assert got[2] == "small"
    assert got[1] == BIG + "v2"  # update with multi-MB image won
