"""Wavefront decoder parity: the numpy-vectorized scan must produce
byte-identical columns to the sequential python decoder on every event
type, before_mode, null pattern, multi-table interleave, filter, and
start-position — plus the small-chunk fallback."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from mysql_binlog_spark.sources.binlog import _pa_type, spark_type_of
from mysql_binlog_spark.sources.vector import (
    chunk_vector_kinds,
    materialize_column,
)
from mysql_binlog_spark.sources.wavefront import decode_chunk_wavefront
from mysql_binlog_spark.wire import (
    CHARSET_BINARY,
    TYPE_BLOB,
    TYPE_DOUBLE,
    TYPE_LONG,
    TYPE_LONGLONG,
    TYPE_SHORT,
    TYPE_TIMESTAMP2,
    TYPE_TINY,
    TYPE_VARCHAR,
    BinlogWriter,
    TableSchema,
    WireColumn,
    decode_chunk,
)

T1 = TableSchema(
    "app", "transcripts",
    [
        WireColumn("conv_id", TYPE_VARCHAR, nullable=False, meta=64),
        WireColumn("turn_idx", TYPE_LONG, nullable=False),
        WireColumn("role", TYPE_VARCHAR, nullable=False, meta=32),
        WireColumn("text", TYPE_BLOB, nullable=False, meta=2),
        WireColumn("tool", TYPE_VARCHAR, nullable=True, meta=64),
        WireColumn("ts", TYPE_TIMESTAMP2, nullable=False, meta=6),
        WireColumn("tool_version", TYPE_VARCHAR, nullable=True, meta=32),
    ],
    (0, 1), 100,
)
# second table: different layout, >8 columns (multi-byte null bitmap),
# wide varchar (2-byte prefix), binary blob, int width spread
T2 = TableSchema(
    "app", "wide",
    [
        # conv_id shared with T1 (same kind); w_turn is a SHORT on purpose
        # (different width than T1's LONG turn_idx → must NOT share a name)
        WireColumn("conv_id", TYPE_VARCHAR, nullable=False, meta=300),
        WireColumn("w_turn", TYPE_SHORT, nullable=False),
        WireColumn("a", TYPE_TINY),
        WireColumn("b", TYPE_LONGLONG),
        WireColumn("c", TYPE_DOUBLE),
        WireColumn("d", TYPE_VARCHAR, meta=40),
        WireColumn("e", TYPE_BLOB, meta=3, charset=CHARSET_BINARY),
        WireColumn("f", TYPE_TIMESTAMP2, meta=0),
        WireColumn("g", TYPE_VARCHAR, meta=40),
        WireColumn("h", TYPE_LONG),
    ],
    (0, 1), 200,
)
UNION = ["conv_id", "turn_idx", "role", "text", "tool", "ts",
         "tool_version", "w_turn", "a", "b", "c", "d", "e", "f", "g", "h"]


def _t1_row(i):
    return {
        "conv_id": f"conv_{i % 31:03d}", "turn_idx": i % 40,
        "role": ("user", "assistant")[i % 2],
        "text": f"msg {i} " * (i % 4 + 1),
        "tool": None if i % 3 == 0 else f"tool_{i % 5}",
        "ts": (1704067200 + i, (i * 137) % 1000000),
        "tool_version": None if i % 4 else f"v{i % 3}",
    }


def _t2_row(i):
    return {
        "conv_id": f"w{i}" * (i % 7 + 1), "w_turn": i % 100 - 50,
        "a": None if i % 5 == 0 else (i % 251) - 125,
        "b": None if i % 6 == 0 else i * 999999937 - 4_000_000_000,
        "c": None if i % 7 == 0 else i * 0.125,
        "d": None if i % 2 == 0 else f"dval_{i} é",
        "e": None if i % 3 == 0 else bytes([i % 256, 0, 255, i % 7]),
        "f": (1600000000 + i, 0),
        "g": None if i % 11 == 0 else "",  # empty string ≠ NULL
        "h": None if i % 4 == 0 else -i,
    }


def build_chunk(n_events: int = 40, rows_per_event: int = 9) -> bytes:
    w = BinlogWriter()
    w.write_table_map(0, T1)
    w.write_table_map(0, T2)
    k = 0
    for e in range(n_events):
        tab, mk = (T1, _t1_row) if e % 2 == 0 else (T2, _t2_row)
        rows = [mk(k + j) for j in range(rows_per_event)]
        if e % 5 == 3:
            befores = [mk(k + j + 1000) for j in range(rows_per_event)]
            w.write_rows(e, tab, "update", rows, befores)
        elif e % 5 == 4:
            w.write_rows(e, tab, "delete", rows)
        else:
            w.write_rows(e, tab, "insert", rows)
        if e % 7 == 0:
            w.write_heartbeat("binlog.000001")
        k += rows_per_event
    return w.getvalue()


def assert_parity(data, union, include=None, exclude=None, start_pos=0,
                  before_mode="full"):
    kinds = chunk_vector_kinds(data, include, exclude, union)
    assert kinds is not None
    bp = decode_chunk(data, include=include, exclude=exclude,
                      start_pos=start_pos, image_cols=union,
                      before_mode=before_mode, verify_crc=True)
    bw = decode_chunk_wavefront(data, image_cols=union, include=include,
                                exclude=exclude, start_pos=start_pos,
                                before_mode=before_mode, verify_crc=True)
    assert len(bp) == len(bw)
    assert list(bp.ev_cnt) == list(bw.ev_cnt)
    assert bp.ev_pos == bw.ev_pos and bp.ev_action == bw.ev_action
    assert bp.ev_ts == bw.ev_ts and bp.ev_server == bw.ev_server
    np_buf = np.frombuffer(data, np.uint8)
    all_cols = {c.name: c for t in (T1, T2) for c in t.columns}
    for side, pcols, wcols in (("before", bp.before_cols, bw.before_cols),
                               ("after", bp.after_cols, bw.after_cols)):
        for j, name in enumerate(union):
            pt = _pa_type(spark_type_of(all_cols[name]))
            got = materialize_column(
                np_buf, kinds.get(name), wcols[j], len(bw), pt
            ).to_pylist()
            want = pcols[j]
            if kinds.get(name) == ("ts", all_cols[name].meta) or (
                kinds.get(name) and kinds[name][0] == "ts"
            ):
                want = [
                    None if v is None
                    else dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=v)
                    for v in want
                ]
            if kinds.get(name) and kinds[name][0] == "b":
                want = [None if v is None else bytes(v) for v in want]
            assert got == want, (side, name, got[:6], want[:6])


def test_wavefront_parity_full():
    assert_parity(build_chunk(), UNION, before_mode="full")


def test_wavefront_parity_delete_only_and_none():
    data = build_chunk()
    assert_parity(data, UNION, before_mode="delete_only")
    assert_parity(data, UNION, before_mode="none")


def test_wavefront_parity_with_filters_and_start_pos():
    data = build_chunk()
    assert_parity(data, UNION, include={("app", "transcripts")})
    assert_parity(data, UNION, exclude={("app", "wide")})
    # start mid-chunk: pick an offset between events
    bp = decode_chunk(data, image_cols=UNION)
    mid = bp.ev_pos[len(bp.ev_pos) // 2]
    assert_parity(data, UNION, start_pos=mid)


def test_wavefront_small_chunk_falls_back():
    data = build_chunk(n_events=4)  # < MIN_WAVEFRONT_EVENTS
    bw = decode_chunk_wavefront(data, image_cols=UNION)
    bp = decode_chunk(data, image_cols=UNION, value_mode="offsets")
    assert len(bw) == len(bp)
    for j in range(len(UNION)):
        assert np.array_equal(
            np.frombuffer(bw.after_cols[j], np.int64)
            if not isinstance(bw.after_cols[j], np.ndarray)
            else bw.after_cols[j],
            np.frombuffer(bp.after_cols[j], np.int64),
        )


def test_wavefront_desync_raises():
    data = bytearray(build_chunk())
    # corrupt a varchar length byte inside the first T1 insert event's rows
    bp = decode_chunk(bytes(data), image_cols=UNION)
    first = bp.ev_pos[0]
    data[first + 30 : first + 40] = bytes([250] * 10)
    with pytest.raises((ValueError, IndexError, AssertionError)):
        decode_chunk_wavefront(
            bytes(data), image_cols=UNION, before_mode="full"
        )


# ------------------------------------------------- property-based parity

from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_binlog_spark.wire import TYPE_LONGLONG as _I8
from mysql_binlog_spark.wire import TYPE_TINY as _I1

_COLUMN_MAKERS = [
    lambda i, null: WireColumn(f"c{i}", TYPE_VARCHAR, nullable=null, meta=40),
    lambda i, null: WireColumn(f"c{i}", TYPE_VARCHAR, nullable=null, meta=300),
    lambda i, null: WireColumn(f"c{i}", TYPE_BLOB, nullable=null, meta=2),
    lambda i, null: WireColumn(f"c{i}", TYPE_BLOB, nullable=null, meta=3,
                               charset=CHARSET_BINARY),
    lambda i, null: WireColumn(f"c{i}", _I1, nullable=null),
    lambda i, null: WireColumn(f"c{i}", _I1, nullable=null, signed=False),
    lambda i, null: WireColumn(f"c{i}", TYPE_SHORT, nullable=null),
    lambda i, null: WireColumn(f"c{i}", TYPE_LONG, nullable=null),
    lambda i, null: WireColumn(f"c{i}", _I8, nullable=null),
    lambda i, null: WireColumn(f"c{i}", TYPE_DOUBLE, nullable=null),
    lambda i, null: WireColumn(f"c{i}", TYPE_TIMESTAMP2, nullable=null,
                               meta=3),
    lambda i, null: WireColumn(f"c{i}", TYPE_TIMESTAMP2, nullable=null,
                               meta=0),
]

_INT_RANGE = {
    _I1: (-128, 127), TYPE_SHORT: (-32768, 32767),
    TYPE_LONG: (-(2**31), 2**31 - 1), _I8: (-(2**63), 2**63 - 1),
}


def _value_for(c, rnd):
    if c.nullable and rnd.random() < 0.3:
        return None
    t = c.ctype
    if t == TYPE_VARCHAR:
        return "".join(rnd.choice("aé 7✓x") for _ in range(rnd.randrange(0, 12)))
    if t == TYPE_BLOB:
        if c.charset == CHARSET_BINARY:
            return bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 9)))
        return "b" * rnd.randrange(0, 20)
    if t in _INT_RANGE:
        lo, hi = _INT_RANGE[t]
        if not c.signed:
            lo, hi = 0, 2 * hi + 1
        return rnd.randrange(lo, hi + 1)
    if t == TYPE_DOUBLE:
        return rnd.choice([0.0, -1.5, 3.25e10, -7e-3, 123456.789])
    if t == TYPE_TIMESTAMP2:
        return (rnd.randrange(0, 2**31), rnd.randrange(0, 1000) * 1000)
    raise AssertionError(t)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, len(_COLUMN_MAKERS) - 1),
                       st.booleans()),
             min_size=1, max_size=11),
    st.integers(0, 2**32 - 1),
)
def test_wavefront_random_schema_parity(col_spec, seed):
    """Random vectorizable schemas/rows/null patterns: the wavefront
    kernels must reproduce the python decoder exactly (including update
    pairing), beyond the hand-written cases above."""
    import random

    rnd = random.Random(seed)
    cols = [_COLUMN_MAKERS[k](i, null) for i, (k, null) in enumerate(col_spec)]
    t = TableSchema("db", "t", cols, (0,), 300)
    union = [c.name for c in cols]
    w = BinlogWriter()
    w.write_table_map(0, t)
    for e in range(18):  # ≥ MIN_WAVEFRONT_EVENTS
        rows = [
            {c.name: _value_for(c, rnd) for c in cols}
            for _ in range(rnd.randrange(1, 5))
        ]
        action = ("insert", "update", "delete")[e % 3]
        if action == "update":
            befores = [
                {c.name: _value_for(c, rnd) for c in cols} for _ in rows
            ]
            w.write_rows(e, t, action, rows, befores)
        else:
            w.write_rows(e, t, action, rows)
    data = w.getvalue()
    kinds = chunk_vector_kinds(data, None, None, union)
    assert kinds is not None
    bp = decode_chunk(data, image_cols=union, verify_crc=True)
    bw = decode_chunk_wavefront(data, image_cols=union, verify_crc=True)
    assert len(bp) == len(bw) and list(bp.ev_cnt) == list(bw.ev_cnt)
    np_buf = np.frombuffer(data, np.uint8)
    for side, pcols, wcols in (("before", bp.before_cols, bw.before_cols),
                               ("after", bp.after_cols, bw.after_cols)):
        for j, c in enumerate(cols):
            pt = _pa_type(spark_type_of(c))
            got = materialize_column(
                np_buf, kinds.get(c.name), wcols[j], len(bw), pt
            ).to_pylist()
            want = bp.before_cols[j] if side == "before" else bp.after_cols[j]
            if kinds.get(c.name, ("",))[0] == "ts":
                want = [
                    None if v is None
                    else dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=v)
                    for v in want
                ]
            if c.charset == CHARSET_BINARY:
                want = [None if v is None else bytes(v) for v in want]
            assert got == want, (side, c.name, got[:4], want[:4])


# ------------------------------------------------ single-walk fast path (r7)


def build_gtid_chunk(n_txns: int = 8, rows_per_event: int = 6) -> bytes:
    """GTID/XID-framed multi-table chunk: txn i = GTID, two row events
    (alternating tables/actions), XID — plus one row event BEFORE any
    GTID frame (must decode with gtid=None)."""
    w = BinlogWriter()
    w.write_table_map(0, T1)
    w.write_table_map(0, T2)
    w.write_rows(0, T1, "insert", [_t1_row(j) for j in range(rows_per_event)])
    sid_a = bytes(range(16))
    sid_b = bytes(range(16, 32))
    k = rows_per_event
    for i in range(n_txns):
        w.write_gtid(i, sid_a if i % 2 == 0 else sid_b, 100 + i)
        for e in range(2):
            tab, mk = (T1, _t1_row) if (i + e) % 2 == 0 else (T2, _t2_row)
            rows = [mk(k + j) for j in range(rows_per_event)]
            if (i + e) % 3 == 2:
                w.write_rows(i, tab, "update", rows,
                             [mk(k + j + 500) for j in range(rows_per_event)])
            elif (i + e) % 3 == 1:
                w.write_rows(i, tab, "delete", rows)
            else:
                w.write_rows(i, tab, "insert", rows)
            k += rows_per_event
        w.write_xid(i, 9000 + i)
    return w.getvalue()


def _assert_batches_equal(a, b):
    assert a.n_rows == b.n_rows and a.n_events == b.n_events
    assert a.n_bytes == b.n_bytes
    assert list(a.ev_pos) == list(b.ev_pos)
    assert list(a.ev_server) == list(b.ev_server)
    assert list(a.ev_ts) == list(b.ev_ts)
    assert list(a.ev_schema) == list(b.ev_schema)
    assert list(a.ev_table) == list(b.ev_table)
    assert list(a.ev_action) == list(b.ev_action)
    assert list(a.ev_gtid) == list(b.ev_gtid)
    assert list(a.ev_cnt) == list(b.ev_cnt)
    for side in ("before_cols", "after_cols"):
        for x, y in zip(getattr(a, side), getattr(b, side)):
            assert (np.asarray(x) == np.asarray(y)).all()


def test_fast_scan_parity_with_general_walk():
    """decode_chunk_vectorized's single-walk fast path must be
    batch-identical to the general wavefront walk on a GTID/XID-framed
    multi-table chunk, for every before_mode and filter shape —
    including the pre-GTID row event (gtid=None) and the kinds map."""
    from mysql_binlog_spark.sources.wavefront import decode_chunk_vectorized

    data = build_gtid_chunk()
    for before_mode in ("full", "delete_only", "none"):
        for include in (None, {("app", "transcripts")}, {("app", "wide")}):
            fast, kinds = decode_chunk_vectorized(
                data, UNION, include=include, before_mode=before_mode
            )
            assert kinds == chunk_vector_kinds(data, include, None, UNION)
            ref = decode_chunk_wavefront(
                data, image_cols=UNION, include=include,
                before_mode=before_mode
            )
            _assert_batches_equal(fast, ref)
    # some rows precede any GTID frame; the rest carry their txn's tag
    fast, _ = decode_chunk_vectorized(data, UNION)
    assert fast.ev_gtid[0] is None and any(g for g in fast.ev_gtid)


def test_fast_scan_delegates_sequential_semantics():
    """start_pos / CRC verify / GTID resume take the general walk — same
    batch either way, so the fast path's eligibility gate loses nothing."""
    from mysql_binlog_spark.sources.wavefront import decode_chunk_vectorized

    data = build_gtid_chunk()
    mid = len(data) // 2
    for kw in (
        {"start_pos": mid},
        {"verify_crc": True},
        {"start_after_gtid": ("00010203-0405-0607-0809-0a0b0c0d0e0f", 103)},
    ):
        fast, kinds = decode_chunk_vectorized(data, UNION, **kw)
        ref = decode_chunk_wavefront(data, image_cols=UNION, **kw)
        assert kinds is not None
        _assert_batches_equal(fast, ref)


def test_fast_scan_truncation_and_malformed():
    from mysql_binlog_spark.sources.wavefront import decode_chunk_vectorized
    from mysql_binlog_spark.wire import TruncatedFrameError

    data = build_gtid_chunk()
    cut = data[: len(data) - 5]
    with pytest.raises(TruncatedFrameError):
        decode_chunk_vectorized(cut, UNION)
    fast, _ = decode_chunk_vectorized(cut, UNION, tolerate_truncation=True)
    ref = decode_chunk_wavefront(cut, image_cols=UNION,
                                 tolerate_truncation=True)
    _assert_batches_equal(fast, ref)
