"""The full 16-type surface through the DataFrame source (VERDICT #1):
native Spark types from the decode source, zero-date policy, and
hash-parity with the DuckDB oracle at test scale."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conftest import assert_frames_match
from mysql_binlog_spark import driver_queries as dq
from mysql_binlog_spark.fixtures.generator import typed_image_cols
from mysql_binlog_spark.sources.binlog import image_view, read_binlog


@pytest.fixture(scope="module")
def typed_chunks(spark, sf_dir):
    return dq.typed_fixture_dir(spark, sf_dir)


def typed_df(spark, typed_chunks):
    dec = read_binlog(
        spark,
        os.path.join(typed_chunks, "typed.*[0-9]"),
        image_cols=typed_image_cols(),
    )
    return image_view(dec, [n for n, _ in typed_image_cols()])


def test_source_schema_is_native(spark, typed_chunks):
    """DecimalType/DateType/FloatType/BinaryType etc. come OUT of the
    source — not post-hoc casts (the round-1 gap: 4/16 types mapped)."""
    df = typed_df(spark, typed_chunks)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {
        "row_id": "bigint", "c_tiny": "int", "c_utiny": "int",
        "c_short": "int", "c_int24": "int", "c_long": "int",
        "c_big": "bigint", "c_ubig": "decimal(20,0)", "c_float": "float",
        "c_double": "double", "c_dec": "decimal(12,3)", "c_date": "date",
        "c_dt": "string", "c_time": "string", "c_ts": "timestamp",
        "c_bit": "string", "c_enum": "string", "c_set": "string",
        "c_varchar": "string", "c_blob": "string", "c_bin": "binary",
        "c_json": "binary", "c_geom": "binary", "c_latin1": "string",
    }
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_native_values_spot_check(spark, typed_chunks):
    """Exact-type spot checks: unsigned BIGINT > 2^63-1 survives as an
    exact decimal, NEWDECIMAL scale is preserved, zero dates are NULL."""
    from decimal import Decimal

    df = typed_df(spark, typed_chunks)
    r = {x["row_id"]: x for x in df.filter(F.col("row_id").isin(5, 95)).collect()}
    assert r[5]["c_ubig"] == Decimal("9223372036854775813")
    assert r[5]["c_dec"] == Decimal("-0.185")
    assert str(r[5]["c_date"]) == "2023-06-06"
    assert r[5]["c_float"] == 5.5
    assert isinstance(r[5]["c_bin"], (bytes, bytearray))
    # e=95: 95%19=0 and 95%13!=0 → zero-date sentinel → NULL (SURVEY §7.8)
    assert r[95]["c_date"] is None
    # e=95: 95%5=0 → negative TIME2
    assert r[95]["c_time"].startswith("-")
    # JSON/GEOMETRY carried opaque through the BLOB fold (round-2 #1)
    assert bytes(r[5]["c_json"]) == b'{"id": 5, "tag": "t0"}'
    assert len(bytes(r[5]["c_geom"])) == 16
    # latin1 VARCHAR converted via Windows-1252 (Collation.php:984-1001)
    assert r[5]["c_latin1"] == "smörgås_5 €±ÿ"
    # NULL coverage of the new columns: e=115 → 115%23=0 → NULL JSON
    r115 = df.filter(F.col("row_id") == 115).collect()[0]
    assert r115["c_json"] is None
    assert df.filter(F.col("row_id") == 145).collect()[0]["c_latin1"] is None


def test_cdc_decode_types_matches_oracle(spark, ddb, sf_dir):
    """The driver-gate replica over the full 16-type query."""
    sdf = dq.q_cdc_decode_types(spark, sf_dir)
    odf = ddb.execute(dq.oracle_cdc_decode_types()).df()
    assert_frames_match(sdf, odf, "cdc_decode_types")


def test_discover_tables_full_types(spark, typed_chunks):
    """discover_tables maps every wire type (round-1 KeyError gap)."""
    from mysql_binlog_spark.sources.binlog import discover_tables

    m = discover_tables(spark, os.path.join(typed_chunks, "typed.*[0-9]"))
    cols = dict(m[("app", "typed")])
    assert cols["c_dec"] == "decimal(12,3)"
    assert cols["c_ubig"] == "decimal(20,0)"
    assert cols["c_date"] == "date"
    assert cols["c_bin"] == "binary"
    assert cols["c_float"] == "float"


def test_validate_chunks_reason_taxonomy(spark, tmp_path):
    """The quarantine report's coarse reasons are deterministic classes:
    flipped CRC byte → 'crc', mid-frame cut → 'truncated', garbage →
    'malformed'; a healthy chunk reports ok with its row count — and
    read_binlog(on_error='skip') decodes exactly the healthy chunks."""
    from mysql_binlog_spark import spec
    from mysql_binlog_spark.fixtures.generator import generate_binlog_chunks
    from mysql_binlog_spark.sources.binlog import read_binlog, validate_chunks

    sf = os.environ.get("MBS_TEST_SF", "/root/testdata/sf0.001")
    spark.read.parquet(os.path.join(sf, "events.parquet")) \
        .createOrReplaceTempView("events")
    changelog = spark.sql(
        spec.changelog_sql("spark", with_duplicates=False,
                           events_per_file=2000)
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    generate_binlog_chunks(changelog, src)
    names = sorted(f for f in os.listdir(src)
                   if f.startswith("binlog.") and not f.endswith(".json"))
    good = os.path.join(src, names[0])
    data = open(good, "rb").read()
    crc_bad = str(tmp_path / "binlog.000090")
    open(crc_bad, "wb").write(data[:-1] + bytes([data[-1] ^ 0xFF]))
    trunc = str(tmp_path / "binlog.000091")
    open(trunc, "wb").write(data[: len(data) - 7])  # cut inside last frame
    garbage = str(tmp_path / "binlog.000092")
    open(garbage, "wb").write(b"\x00" * 64)
    paths = [good, crc_bad, trunc, garbage]
    rep = {r.chunk: (r.ok, r.n_rows, r.reason)
           for r in validate_chunks(spark, paths).collect()}
    assert rep[names[0]][0] and rep[names[0]][1] > 0
    assert rep["binlog.000090"] == (False, 0, "crc")
    assert rep["binlog.000091"] == (False, 0, "truncated")
    assert rep["binlog.000092"][0] is False  # any coarse class is fine
    n = read_binlog(spark, paths, verify_crc=True, on_error="skip").count()
    assert n == rep[names[0]][1]
