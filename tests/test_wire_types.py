"""Round-trip tests for the full reference type table (SURVEY.md §1.2):
integer widths/signedness, FLOAT/DOUBLE, packed NEWDECIMAL, DATE /
DATETIME2 / TIME2, BIT, ENUM/SET via the packed-STRING metadata trick."""

from __future__ import annotations

import pytest

from mysql_binlog_spark.wire import (
    TYPE_BIT,
    TYPE_DATE,
    TYPE_DATETIME2,
    TYPE_DOUBLE,
    TYPE_ENUM,
    TYPE_FLOAT,
    TYPE_INT24,
    TYPE_LONG,
    TYPE_LONGLONG,
    TYPE_NEWDECIMAL,
    TYPE_SET,
    TYPE_SHORT,
    TYPE_TIME2,
    TYPE_TINY,
    BinlogWriter,
    TableSchema,
    WireColumn,
    decode_chunk,
    decode_decimal,
    encode_decimal,
)


def roundtrip(cols: list[WireColumn], row: dict) -> dict:
    t = TableSchema("app", "t", cols, (0,), 100)
    w = BinlogWriter()
    w.write_table_map(0, t)
    w.write_rows(0, t, "insert", [row])
    b = decode_chunk(w.getvalue(), verify_crc=True)
    assert len(b) == 1
    return b.after[0]


def test_integer_widths_and_signedness():
    cols = [
        WireColumn("i8", TYPE_TINY, signed=True),
        WireColumn("u8", TYPE_TINY, signed=False),
        WireColumn("i16", TYPE_SHORT, signed=True),
        WireColumn("u16", TYPE_SHORT, signed=False),
        WireColumn("i24", TYPE_INT24, signed=True),
        WireColumn("i32", TYPE_LONG, signed=True),
        WireColumn("u32", TYPE_LONG, signed=False),
        WireColumn("i64", TYPE_LONGLONG, signed=True),
        WireColumn("u64", TYPE_LONGLONG, signed=False),
    ]
    row = {
        "i8": -128, "u8": 255, "i16": -32768, "u16": 65535,
        "i24": -(1 << 23), "i32": -(1 << 31), "u32": (1 << 32) - 1,
        "i64": -(1 << 63),
        # > int64 max: the reference renders it via GMP as a decimal
        # (UIntLeReadTrait.php:119-141); we keep the exact Python int
        "u64": (1 << 64) - 1,
    }
    assert roundtrip(cols, row) == row


def test_float_double():
    cols = [
        WireColumn("f", TYPE_FLOAT, meta=4),
        WireColumn("d", TYPE_DOUBLE),
    ]
    got = roundtrip(cols, {"f": 3.140625, "d": 2.718281828459045})
    # FLOAT is rounded to meta digits (reference quirk, RowFactory.php:90-92)
    assert got["f"] == round(3.140625, 4)
    assert got["d"] == 2.718281828459045


@pytest.mark.parametrize(
    "value,precision,scale",
    [
        ("123.45", 10, 2),
        ("-123.45", 10, 2),
        ("0.00", 10, 2),
        ("9999999999999999999999999.999999999", 34, 9),
        ("-0.000000001", 18, 9),
        ("42", 5, 0),
        ("-99999", 5, 0),
        ("1234567890123456789.123456789012", 31, 12),
    ],
)
def test_packed_decimal(value, precision, scale):
    raw = encode_decimal(value, precision, scale)
    got, off = decode_decimal(memoryview(raw), 0, precision, scale)
    assert off == len(raw)
    want = value if "." in value or scale == 0 else value
    # normalize leading zeros like the decoder does
    neg = want.startswith("-")
    w = want.lstrip("-")
    ip, _, fr = w.partition(".")
    w = (ip.lstrip("0") or "0") + (("." + fr) if scale else "")
    assert got == ("-" + w if neg and w != "0.00" else w) or got == want


def test_decimal_in_rows():
    cols = [WireColumn("amount", TYPE_NEWDECIMAL, meta=(12 << 8) | 4)]
    assert roundtrip(cols, {"amount": "-12345678.9012"}) == {
        "amount": "-12345678.9012"
    }


def test_temporal_types():
    cols = [
        WireColumn("d", TYPE_DATE),
        WireColumn("dt0", TYPE_DATETIME2, meta=0),
        WireColumn("dt6", TYPE_DATETIME2, meta=6),
        WireColumn("t3", TYPE_TIME2, meta=3),
    ]
    row = {
        "d": "2024-02-29",
        "dt0": "2024-02-29 23:59:59",
        "dt6": "2024-02-29 23:59:59.123456",
        "t3": "838:59:58.999",
    }
    assert roundtrip(cols, row) == row


def test_zero_date_sentinel():
    cols = [WireColumn("d", TYPE_DATE)]
    # the reference renders zero dates verbatim (DateTimeReadTrait.php:45-52)
    assert roundtrip(cols, {"d": "0000-00-00"}) == {"d": "0000-00-00"}


def test_bit_renders_bit_string():
    cols = [WireColumn("b12", TYPE_BIT, meta=12)]
    assert roundtrip(cols, {"b12": "101100111000"}) == {"b12": "101100111000"}


def test_enum_and_set():
    cols = [
        WireColumn("e", TYPE_ENUM, values=("small", "medium", "large")),
        WireColumn("s", TYPE_SET,
                   values=("read", "write", "admin", "audit")),
    ]
    assert roundtrip(cols, {"e": "medium", "s": "read,admin"}) == {
        "e": "medium", "s": "read,admin"
    }
    # unknown enum label encodes as index 0 → decodes to '' (reference
    # quirk, RowFactory.php:136-147)
    assert roundtrip(cols, {"e": "nope", "s": ""}) == {"e": "", "s": ""}


def test_enum_256_values_uses_two_bytes():
    vals = tuple(f"v{i}" for i in range(300))
    cols = [WireColumn("e", TYPE_ENUM, values=vals)]
    assert roundtrip(cols, {"e": "v299"}) == {"e": "v299"}


def test_mixed_all_types_with_nulls():
    cols = [
        WireColumn("id", TYPE_LONGLONG, nullable=False, signed=True),
        WireColumn("amount", TYPE_NEWDECIMAL, meta=(10 << 8) | 2),
        WireColumn("ratio", TYPE_DOUBLE),
        WireColumn("day", TYPE_DATE),
        WireColumn("flags", TYPE_BIT, meta=8),
        WireColumn("size", TYPE_ENUM, values=("s", "m", "l")),
    ]
    row = {"id": 7, "amount": None, "ratio": None, "day": "1999-12-31",
           "flags": "00000001", "size": "l"}
    assert roundtrip(cols, row) == row


def test_json_geometry_blob_fold():
    """JSON (0xf5) / GEOMETRY (0xff) fold into the BLOB layout — 1-byte
    length-prefix-width metadata, length-prefixed opaque payload
    (ColumnMetadataFactory.php:59-62; type codes ColumnType.php:31,41)."""
    from mysql_binlog_spark.wire import TYPE_GEOMETRY, TYPE_JSON

    cols = [
        WireColumn("j", TYPE_JSON, meta=4),
        WireColumn("g", TYPE_GEOMETRY, meta=4),
    ]
    jb = b'{"k": [1, 2, null]}'
    gb = bytes(range(32))  # SRID+WKB-ish opaque payload
    got = roundtrip(cols, {"j": jb, "g": gb})
    assert got == {"j": jb, "g": gb}
    assert isinstance(got["j"], (bytes, bytearray))
    # NULLs ride the null bitmap like any BLOB
    assert roundtrip(cols, {"j": None, "g": gb}) == {"j": None, "g": gb}


def test_latin1_windows1252_conversion():
    """latin1 text decodes via Windows-1252 ("Yes, really",
    Collation.php:984-1001) including the Euro sign at 0x80 and MySQL's
    identity mapping for the five cp1252-undefined bytes."""
    from mysql_binlog_spark.wire import (
        CHARSET_LATIN1,
        TYPE_VARCHAR,
        latin1_to_str,
        str_to_latin1,
    )

    cols = [WireColumn("s", TYPE_VARCHAR, meta=80, charset=CHARSET_LATIN1)]
    text = "smörgås € ±ÿ – “quoted”"
    assert roundtrip(cols, {"s": text}) == {"s": text}
    # byte-level spot checks against MySQL's documented mapping
    assert latin1_to_str(b"\x80") == "€"   # Euro sign
    assert latin1_to_str(b"\x93ok\x94") == "“ok”"
    assert str_to_latin1("€") == b"\x80"
    # the five cp1252-undefined bytes map to identity codepoints
    for b in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
        assert latin1_to_str(bytes([b])) == chr(b)
        assert str_to_latin1(chr(b)) == bytes([b])
    # a latin1 BLOB converts too (the charset TLV covers BLOB columns)
    from mysql_binlog_spark.wire import TYPE_BLOB

    bcols = [WireColumn("b", TYPE_BLOB, meta=2, charset=CHARSET_LATIN1)]
    assert roundtrip(bcols, {"b": "déjà vu €"}) == {"b": "déjà vu €"}
