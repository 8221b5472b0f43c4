"""Wavefront decoder: numpy-vectorized row scanning ACROSS events.

The compiled offset loops (wire.py) still interpret ~1.4µs of Python per
row.  This module removes the per-row Python entirely: since every
included row event's first row offset is known from a cheap frame walk,
row ``r`` of EVERY event can be decoded simultaneously — one numpy
"wavefront" per row index, vector width = number of events.  Each
iteration advances a cursor vector through one row image per event using
byte gathers (length prefixes, null bitmaps) and records the same packed
int64 descriptors the offset-scan path uses ((offset << 32) | length for
varlen, plain offset for fixed, -1 for NULL); materialization is shared
(sources/vector.py).

Measured ~6-8x faster than the compiled per-row loops on the bench
transcripts shape (64-row events).  Wall time scales with
max-rows-per-event × n_columns numpy calls, so chunks with very FEW, very
LONG events degrade — the entry point falls back to the offset-scan path
below ``min_events`` included row events.  (MySQL caps row events at
binlog-row-event-max-size ≈ 8KB by default, so real streams are
many-small-events shaped.)

Same correctness surface as decode_chunk: include/exclude pushdown before
row decode, start-position skip, CRC verify, FULL-image validation,
truncation policy, update before/after pairing with before_mode.
Malformed streams fail loudly: gathers past the buffer raise IndexError
and a cursor that does not land exactly on each event's end raises
ValueError (desync check, stricter than the sequential decoder).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..wire import (
    ACTION_BY_EVENT,
    CRC_LEN,
    DELETE_ROWS_V2,
    GTID_EVENT,
    HEADER_LEN,
    MAGIC,
    TABLE_MAP_EVENT,
    UPDATE_ROWS_V2,
    WRITE_ROWS_V2,
    XID_EVENT,
    CrcMismatchError,
    DecodedBatch,
    TableSchema,
    TruncatedFrameError,
    _advance_width,
    _DECODER_CACHE,
    _parse_table_map,
    _varlen_prefix,
    format_gtid,
    normalize_gtid_resume,
    read_lenenc,
    table_admitted,
)

MIN_WAVEFRONT_EVENTS = 16


# ------------------------------------------------------------- kernel codegen

def _wf_image_lines(
    t: TableSchema, slot: dict, store_prefix: str | None, ind: str
) -> list[str]:
    """Numpy lines advancing cursor vector ``c`` through one row image of
    every active event; stored slots append per-iteration vectors to
    ``{store_prefix}{slot}`` lists."""
    n = len(t.columns)
    nbb = (n + 7) // 8
    L: list[str] = [f"{ind}nb = buf[c].astype(i64)"]
    for k in range(1, nbb):
        L.append(f"{ind}nb |= buf[c + {k}].astype(i64) << {8 * k}")
    L.append(f"{ind}c = c + {nbb}")
    for i, c_ in enumerate(t.columns):
        s = slot.get(c_.name) if store_prefix is not None else None
        st = f"{store_prefix}{s}.append" if s is not None else None
        varlen = _advance_width(c_) is None
        if c_.nullable:
            L.append(f"{ind}nm = (nb >> {i}) & 1")
            if varlen:
                lw = _varlen_prefix(c_)
                if lw == 1:
                    L.append(f"{ind}ln = buf[c].astype(i64)")
                else:
                    L.append(f"{ind}ln = buf[c].astype(i64)")
                    for k in range(1, lw):
                        L.append(
                            f"{ind}ln |= buf[c + {k}].astype(i64) << {8 * k}"
                        )
                L.append(f"{ind}ln = np.where(nm == 1, 0, ln)")
                if st:
                    L.append(
                        f"{ind}{st}(np.where(nm == 1, -1, "
                        f"((c + {lw}) << 32) | ln))"
                    )
                L.append(f"{ind}c = c + np.where(nm == 1, 0, {lw} + ln)")
            else:
                w = _advance_width(c_)
                if st:
                    L.append(f"{ind}{st}(np.where(nm == 1, -1, c))")
                L.append(f"{ind}c = c + {w} * (1 - nm)")
        else:
            if varlen:
                lw = _varlen_prefix(c_)
                L.append(f"{ind}ln = buf[c].astype(i64)")
                for k in range(1, lw):
                    L.append(f"{ind}ln |= buf[c + {k}].astype(i64) << {8 * k}")
                if st:
                    L.append(f"{ind}{st}(((c + {lw}) << 32) | ln)")
                L.append(f"{ind}c = c + {lw} + ln")
            else:
                w = _advance_width(c_)
                if st:
                    L.append(f"{ind}{st}(c)")
                L.append(f"{ind}c = c + {w}")
    return L


def _compile_wavefront(t: TableSchema, columns: list[str], mode: str):
    """f(buf, starts, ends) → (counts, hist, S1, S2)

    mode: 'single'    — one stored image          (S1 = stores, S2 = None)
          'pair'      — two stored images         (S1 = image1, S2 = image2)
          'skip_then' — advance one, store second (S1 = None, S2 = stores)
          'skip'      — advance only              (both None)
    counts: rows per event; hist: per-iteration active-event index
    vectors; S*: per-union-slot lists of per-iteration descriptor vectors
    (None for slots the table does not cover)."""
    sig = (
        tuple(
            (c.name, c.ctype, c.meta, c.nullable, c.signed, c.values,
             c.charset)
            for c in t.columns
        ),
        tuple(columns), mode, "wavefront",
    )
    fn = _DECODER_CACHE.get(sig)
    if fn is not None:
        return fn
    slot = {name: i for i, name in enumerate(columns)}
    covered = [slot[c.name] for c in t.columns if c.name in slot]
    ns: dict = {"np": np, "i64": np.int64}
    L = ["def _wf(buf, starts, ends):"]
    L.append("    cur = starts.copy()")
    L.append("    counts = np.zeros(len(cur), np.int64)")
    L.append("    idx_all = np.arange(len(cur))")
    L.append("    hist = []")

    def declare(prefix: str) -> None:
        for s in covered:
            L.append(f"    {prefix}{s} = []")

    if mode == "single":
        declare("x")
    elif mode == "pair":
        declare("x")
        declare("y")
    elif mode == "skip_then":
        declare("y")
    L.append("    active = cur < ends")
    L.append("    while active.any():")
    L.append("        ai = idx_all[active]")
    L.append("        c = cur[active]")
    if mode == "single":
        L += _wf_image_lines(t, slot, "x", "        ")
    elif mode == "pair":
        L += _wf_image_lines(t, slot, "x", "        ")
        L += _wf_image_lines(t, slot, "y", "        ")
    elif mode == "skip_then":
        L += _wf_image_lines(t, slot, None, "        ")
        L += _wf_image_lines(t, slot, "y", "        ")
    else:
        L += _wf_image_lines(t, slot, None, "        ")
    L.append("        counts[ai] += 1")
    L.append("        hist.append(ai)")
    L.append("        cur[active] = c")
    L.append("        active = cur < ends")
    L.append("    if not (cur == ends).all():")
    L.append("        raise ValueError('wavefront row decode desync')")

    def pack(prefix: str, n_slots: int) -> str:
        cells = [
            f"{prefix}{s}" if s in covered else "None"
            for s in range(n_slots)
        ]
        return "[" + ", ".join(cells) + "]"

    n_slots = len(columns)
    if mode == "single":
        L.append(f"    return counts, hist, {pack('x', n_slots)}, None")
    elif mode == "pair":
        L.append(
            f"    return counts, hist, {pack('x', n_slots)}, "
            f"{pack('y', n_slots)}"
        )
    elif mode == "skip_then":
        L.append(f"    return counts, hist, None, {pack('y', n_slots)}")
    else:
        L.append("    return counts, hist, None, None")
    exec("\n".join(L), ns)  # noqa: S102 - codegen from trusted schema
    fn = ns["_wf"]
    _DECODER_CACHE[sig] = fn
    return fn


# ------------------------------------------------------------------ decode

def decode_chunk_wavefront(
    data: bytes,
    image_cols: list[str],
    include: set[tuple[str, str]] | None = None,
    exclude: set[tuple[str, str]] | None = None,
    start_pos: int = 0,
    verify_crc: bool = False,
    before_mode: str = "full",
    tolerate_truncation: bool = False,
    start_after_gtid: tuple[str, int] | dict[str, int] | None = None,
) -> DecodedBatch:
    """decode_chunk twin returning offsets-mode columns as numpy int64
    arrays, produced by the wavefront kernels.  Falls back to
    decode_chunk(value_mode='offsets') for chunks with fewer than
    MIN_WAVEFRONT_EVENTS included row events (vector width too small to
    amortize numpy call overhead)."""
    assert before_mode in ("full", "delete_only", "none")
    mv = memoryview(data)
    assert bytes(mv[:4]) == MAGIC, "bad binlog magic"
    np_buf = np.frombuffer(data, dtype=np.uint8)
    out = DecodedBatch(image_cols, value_mode="offsets")
    tables: dict[int, TableSchema] = {}
    verdicts: dict[int, object] = {}  # table_id → (t, full_bm) | False
    groups: dict = {}  # (id(t), etype) → [t, etype, ev_idx[], starts[], ends[]]
    n_included = 0
    cur_gtid: str | None = None  # set by GTID frame, cleared by XID
    skip_txn = False  # inside a transaction at/before start_after_gtid
    resume_map = normalize_gtid_resume(start_after_gtid)
    off = 4
    total = len(data)
    unpack = struct.unpack_from
    while off + HEADER_LEN <= total:
        etype = mv[off + 4]
        size = unpack("<I", mv, off + 9)[0]
        if size < HEADER_LEN + CRC_LEN:
            # a frame can never be smaller than header+CRC; size 0 would
            # stall the walk forever — classify as malformed, not a loop
            raise ValueError(
                f"malformed frame at offset {off}: header claims {size} "
                f"bytes (minimum is {HEADER_LEN + CRC_LEN})"
            )
        if off + size > total:
            if tolerate_truncation:
                break
            raise TruncatedFrameError(
                f"truncated frame at offset {off}: header claims {size} "
                f"bytes, {total - off} remain "
                "(pass tolerate_truncation=True to stop at the last "
                "complete frame)"
            )
        body_end = off + size - CRC_LEN
        if verify_crc:
            want = unpack("<I", mv, body_end)[0]
            got = zlib.crc32(mv[off:body_end]) & 0xFFFFFFFF
            if want != got:
                raise CrcMismatchError(f"CRC mismatch at offset {off}")
        out.n_events += 1
        out.n_bytes += size
        if etype == TABLE_MAP_EVENT:
            t = _parse_table_map(mv[off + HEADER_LEN : body_end])
            tables[t.table_id] = t
            verdicts.pop(t.table_id, None)
            out.tables_seen[(t.schema, t.table)] = t
        elif etype in ACTION_BY_EVENT and off >= start_pos and not skip_txn:
            table_id = unpack("<Q", mv, off + HEADER_LEN)[0] & 0xFFFFFFFFFFFF
            v = verdicts.get(table_id)
            if v is None:
                t = tables.get(table_id)
                if t is None:
                    raise ValueError(
                        f"row event for unknown table id {table_id}"
                    )
                if not table_admitted(t.schema, t.table, include, exclude):
                    verdicts[table_id] = v = False
                else:
                    n_ = len(t.columns)
                    nbb_ = (n_ + 7) // 8
                    full = bytes([0xFF] * (nbb_ - 1)) + bytes(
                        [(1 << (n_ - 8 * (nbb_ - 1))) - 1]
                    )
                    verdicts[table_id] = v = (t, nbb_, full)
            if v is not False:
                t, nbb_, full = v
                p = off + HEADER_LEN + 10
                ccount, p = read_lenenc(mv, p)
                assert ccount == len(t.columns)
                n_bm = 2 if etype == UPDATE_ROWS_V2 else 1
                for _ in range(n_bm):
                    if bytes(mv[p : p + nbb_]) != full:
                        raise ValueError(
                            f"partial row image in {t.schema}.{t.table} "
                            "(binlog_row_image != FULL is not supported)"
                        )
                    p += nbb_
                g = groups.get((id(t), etype))
                if g is None:
                    groups[(id(t), etype)] = g = [t, etype, [], [], []]
                g[2].append(n_included)
                g[3].append(p)
                g[4].append(body_end)
                out.ev_pos.append(off)
                out.ev_server.append(unpack("<I", mv, off + 5)[0])
                out.ev_ts.append(unpack("<I", mv, off)[0])
                out.ev_schema.append(t.schema)
                out.ev_table.append(t.table)
                out.ev_action.append(ACTION_BY_EVENT[etype])
                out.ev_gtid.append(cur_gtid)
                n_included += 1
        elif etype == GTID_EVENT:
            # txn lineage tag, mirrors decode_chunk exactly (3-kernel
            # parity): set until the closing XID; NULL on GTID-less logs
            p0 = off + HEADER_LEN
            gno = unpack("<q", mv, p0 + 17)[0]
            cur_gtid = format_gtid(bytes(mv[p0 + 1 : p0 + 17]), gno)
            if resume_map is not None:
                # mirrors decode_chunk: per-SID threshold on the fixed
                # 36-char uuid prefix (GTID-set resume, round 6)
                thr = resume_map.get(cur_gtid[:36])
                skip_txn = thr is not None and gno <= thr
        elif etype == XID_EVENT:
            cur_gtid = None
            skip_txn = False
        off += size

    if n_included < MIN_WAVEFRONT_EVENTS:
        from ..wire import decode_chunk

        return decode_chunk(
            data, include=include, exclude=exclude, start_pos=start_pos,
            verify_crc=verify_crc, image_cols=image_cols,
            before_mode=before_mode,
            tolerate_truncation=tolerate_truncation, value_mode="offsets",
            start_after_gtid=start_after_gtid,
        )

    return _finish_wavefront(np_buf, out, groups, n_included, before_mode)


def _finish_wavefront(
    np_buf: np.ndarray,
    out: DecodedBatch,
    groups: dict,
    n_included: int,
    before_mode: str,
) -> DecodedBatch:
    """Shared row-decode tail: run the compiled wavefront kernels over the
    collected (table, etype) groups and scatter the per-iteration
    descriptor vectors into row-order columns."""
    n_slots = len(out.columns)
    counts = np.zeros(n_included, dtype=np.int64)
    results = []
    for t, etype, ev_idx, starts, ends in groups.values():
        if etype == UPDATE_ROWS_V2:
            mode = "pair" if before_mode == "full" else "skip_then"
        elif etype == DELETE_ROWS_V2:
            mode = "skip" if before_mode == "none" else "single"
        else:
            mode = "single"
        fn = _compile_wavefront(t, out.columns, mode)
        g_counts, hist, s1, s2 = fn(
            np_buf, np.asarray(starts, np.int64), np.asarray(ends, np.int64)
        )
        ev_idx = np.asarray(ev_idx, np.int64)
        counts[ev_idx] = g_counts
        # map stored images to before/after sides
        if etype == UPDATE_ROWS_V2:
            before_s, after_s = s1, s2  # s1 None in skip_then mode
        elif etype == DELETE_ROWS_V2:
            before_s, after_s = s1, None  # delete image IS the before
        else:
            before_s, after_s = None, s1
        results.append((ev_idx, hist, before_s, after_s))

    base = np.zeros(n_included, dtype=np.int64)
    np.cumsum(counts[:-1], out=base[1:])
    total_rows = int(counts.sum())
    before_cols = [np.full(total_rows, -1, np.int64) for _ in range(n_slots)]
    after_cols = [np.full(total_rows, -1, np.int64) for _ in range(n_slots)]
    for ev_idx, hist, before_s, after_s in results:
        gbase = base[ev_idx]
        for r, ai in enumerate(hist):
            pos = gbase[ai] + r
            for side_s, side_out in ((before_s, before_cols),
                                     (after_s, after_cols)):
                if side_s is None:
                    continue
                for s in range(n_slots):
                    if side_s[s] is not None:
                        side_out[s][pos] = side_s[s][r]
    out.before_cols = before_cols
    out.after_cols = after_cols
    out.ev_cnt = counts.tolist()
    out.n_rows = total_rows
    return out


# ---------------------------------------------------- single-walk fast path

def _schema_sig(t: TableSchema) -> tuple:
    return (
        t.schema, t.table,
        tuple(
            (c.name, c.ctype, c.meta, c.nullable, c.signed, c.values,
             c.charset)
            for c in t.columns
        ),
    )


def _kinds_from_maps(
    maps: list, include, exclude, col_names: list[str], data_len: int
) -> dict | None:
    """chunk_vector_kinds over ALREADY-PARSED table maps — the decision
    logic without its own frame walk (round 7: the kinds pre-scan used to
    re-walk every frame header, ~20% of kernel wall)."""
    from ..wire import offset_scannable, vector_kind

    if data_len >= 2**31:
        return None  # int32 offset materialization limit (vector.py)
    kinds: dict[str, tuple] = {}
    stored = set(col_names)
    for t in maps:
        if not table_admitted(t.schema, t.table, include, exclude):
            continue
        if not offset_scannable(t, stored):
            return None
        for c in t.columns:
            if c.name not in stored:
                continue
            k = vector_kind(c)
            prev = kinds.get(c.name)
            if prev is not None and prev != k:
                return None  # conflicting layouts → value loops
            kinds[c.name] = k
    return kinds


_U32 = struct.Struct("<I").unpack_from


def _fast_scan(
    data: bytes,
    mv: memoryview,
    np_buf: np.ndarray,
    out: DecodedBatch,
    include,
    exclude,
    tolerate_truncation: bool,
):
    """Vectorized frame classification (round 7, guide §1.2 per-task
    work): the sequential walk is reduced to the irreducible size-chain
    (ONE unpack per frame); event typing, table-id resolution, GTID
    attribution, bitmap validation and per-event metadata all become
    numpy gathers over the collected offset vector.  Returns
    (groups, n_included, maps) with ``out``'s event metadata filled, or
    None when the chunk needs the general walk (mid-chunk table_id
    remap with a different schema, ≥251-column tables, a row event
    preceding its TABLE_MAP)."""
    total = len(data)
    offs_l: list[int] = []
    append = offs_l.append
    u32 = _U32
    pos = 4
    min_size = HEADER_LEN + CRC_LEN
    while pos + HEADER_LEN <= total:
        size = u32(data, pos + 9)[0]
        if size < min_size:
            raise ValueError(
                f"malformed frame at offset {pos}: header claims {size} "
                f"bytes (minimum is {min_size})"
            )
        if pos + size > total:
            if tolerate_truncation:
                break
            raise TruncatedFrameError(
                f"truncated frame at offset {pos}: header claims {size} "
                f"bytes, {total - pos} remain "
                "(pass tolerate_truncation=True to stop at the last "
                "complete frame)"
            )
        append(pos)
        pos += size

    offs = np.asarray(offs_l, np.int64)
    out.n_events = len(offs)
    if not len(offs):
        out.n_bytes = 0
        return {}, 0, []
    sizes = np_buf[offs + 9].astype(np.int64)
    for k in (10, 11, 12):
        sizes |= np_buf[offs + k].astype(np.int64) << (8 * (k - 9))
    out.n_bytes = int(sizes.sum())
    etypes = np_buf[offs + 4]

    # table maps, in order (few per chunk)
    maps: list[TableSchema] = []
    tm_by_id: dict[int, TableSchema] = {}
    tm_first_off: dict[int, int] = {}
    for i in np.nonzero(etypes == TABLE_MAP_EVENT)[0].tolist():
        o = int(offs[i])
        t = _parse_table_map(mv[o + HEADER_LEN : o + int(sizes[i]) - CRC_LEN])
        maps.append(t)
        out.tables_seen[(t.schema, t.table)] = t
        prev = tm_by_id.get(t.table_id)
        if prev is None:
            tm_by_id[t.table_id] = t
            tm_first_off[t.table_id] = o
        elif _schema_sig(prev) != _schema_sig(t):
            return None  # mid-chunk remap of one table_id → general walk

    row_mask = (
        (etypes == WRITE_ROWS_V2)
        | (etypes == UPDATE_ROWS_V2)
        | (etypes == DELETE_ROWS_V2)
    )
    ridx = np.nonzero(row_mask)[0]
    if not len(ridx):
        return {}, 0, maps
    roffs = offs[ridx]
    rsizes = sizes[ridx]
    retypes = etypes[ridx]
    tid = np_buf[roffs + HEADER_LEN].astype(np.int64)
    for k in range(1, 6):
        tid |= np_buf[roffs + HEADER_LEN + k].astype(np.int64) << (8 * k)

    keep = np.ones(len(ridx), bool)
    table_of: dict[int, TableSchema] = {}
    for u in np.unique(tid).tolist():
        t = tm_by_id.get(u)
        if t is None:
            raise ValueError(f"row event for unknown table id {u}")
        first_row = int(roffs[tid == u][0])
        if first_row < tm_first_off[u]:
            return None  # row before its TABLE_MAP → general walk
        if table_admitted(t.schema, t.table, include, exclude):
            table_of[u] = t
        else:
            keep &= tid != u
    roffs, rsizes, retypes, tid = (
        roffs[keep], rsizes[keep], retypes[keep], tid[keep]
    )
    n_included = len(roffs)
    if not n_included:
        return {}, 0, maps

    # GTID attribution: a row's txn tag is the last GTID frame before it,
    # unless an XID frame intervened (clears the tag) — two searchsorteds
    goffs = offs[etypes == GTID_EVENT]
    xoffs = offs[etypes == XID_EVENT]
    if len(goffs):
        gstr: list[str] = []
        for o in goffs.tolist():
            p0 = o + HEADER_LEN
            gno = struct.unpack_from("<q", data, p0 + 17)[0]
            gstr.append(format_gtid(bytes(mv[p0 + 1 : p0 + 17]), gno))
        gi = np.searchsorted(goffs, roffs, side="right") - 1
        xi = np.searchsorted(xoffs, roffs, side="right") - 1
        last_g = np.where(gi >= 0, goffs[np.clip(gi, 0, None)], -1)
        last_x = np.where(xi >= 0, xoffs[np.clip(xi, 0, None)], -2)
        has_g = (gi >= 0) & (last_g > last_x)
        gil = gi.tolist()
        out.ev_gtid = [
            gstr[g] if h else None for g, h in zip(gil, has_g.tolist())
        ]
    else:
        out.ev_gtid = [None] * n_included

    out.ev_pos = roffs.tolist()
    srv = np_buf[roffs + 5].astype(np.int64)
    for k in (6, 7, 8):
        srv |= np_buf[roffs + k].astype(np.int64) << (8 * (k - 5))
    out.ev_server = srv.tolist()
    ts = np_buf[roffs].astype(np.int64)
    for k in (1, 2, 3):
        ts |= np_buf[roffs + k].astype(np.int64) << (8 * k)
    out.ev_ts = ts.tolist()

    # per-(table, etype) groups + constant-string metadata fills
    scode = np.zeros(n_included, np.int32)
    names: list[tuple[str, str, str]] = []
    groups: dict = {}
    for u, t in table_of.items():
        cc = len(t.columns)
        if cc >= 251:
            return None  # multi-byte lenenc column count → general walk
        nbb = (cc + 7) // 8
        full = bytes([0xFF] * (nbb - 1)) + bytes(
            [(1 << (cc - 8 * (nbb - 1))) - 1]
        )
        full_np = np.frombuffer(full, np.uint8)
        um = tid == u
        for et in (WRITE_ROWS_V2, UPDATE_ROWS_V2, DELETE_ROWS_V2):
            m = um & (retypes == et)
            ev_idx = np.nonzero(m)[0]
            if not len(ev_idx):
                continue
            goffs_g = roffs[ev_idx]
            # lenenc column count (1 byte, validated) + FULL bitmaps
            assert (
                np_buf[goffs_g + HEADER_LEN + 10] == cc
            ).all(), "row event column count mismatch"
            n_bm = 2 if et == UPDATE_ROWS_V2 else 1
            bm = np_buf[
                goffs_g[:, None]
                + (HEADER_LEN + 11)
                + np.arange(n_bm * nbb)
            ]
            if not (bm == np.tile(full_np, n_bm)).all():
                raise ValueError(
                    f"partial row image in {t.schema}.{t.table} "
                    "(binlog_row_image != FULL is not supported)"
                )
            starts = goffs_g + (HEADER_LEN + 11) + n_bm * nbb
            ends = goffs_g + rsizes[ev_idx] - CRC_LEN
            groups[(id(t), et)] = [t, et, ev_idx, starts, ends]
            scode[ev_idx] = len(names)
            names.append((t.schema, t.table, ACTION_BY_EVENT[et]))
    sc = scode.tolist()
    out.ev_schema = [names[c][0] for c in sc]
    out.ev_table = [names[c][1] for c in sc]
    out.ev_action = [names[c][2] for c in sc]
    return groups, n_included, maps


def decode_chunk_vectorized(
    data: bytes,
    image_cols: list[str],
    include: set[tuple[str, str]] | None = None,
    exclude: set[tuple[str, str]] | None = None,
    start_pos: int = 0,
    verify_crc: bool = False,
    before_mode: str = "full",
    tolerate_truncation: bool = False,
    start_after_gtid: tuple[str, int] | dict[str, int] | None = None,
) -> tuple[DecodedBatch | None, dict | None]:
    """ONE-walk decode entry for read_binlog: frame scan, vectorization
    decision and row decode share a single pass (round 7 — previously
    ``chunk_vector_kinds`` walked every frame header and the wavefront
    walk re-walked them all again).  Returns ``(batch, kinds)``;
    ``(None, None)`` means the chunk's columns need the python-value
    loops (caller runs ``decode_chunk`` in python mode).

    Chunks needing sequential semantics (start_pos skip, GTID resume,
    CRC verify) take the general wavefront walk — correctness identical,
    just without the single-pass fusion."""
    from ..wire import decode_chunk
    from .vector import chunk_table_maps

    fast = start_pos == 0 and start_after_gtid is None and not verify_crc

    def general():
        kinds = _kinds_from_maps(
            chunk_table_maps(data), include, exclude, image_cols,
            len(data),
        )
        if kinds is None:
            return None, None
        return (
            decode_chunk_wavefront(
                data, image_cols=image_cols, include=include,
                exclude=exclude, start_pos=start_pos,
                verify_crc=verify_crc, before_mode=before_mode,
                tolerate_truncation=tolerate_truncation,
                start_after_gtid=start_after_gtid,
            ),
            kinds,
        )

    if not fast:
        return general()
    assert before_mode in ("full", "delete_only", "none")
    mv = memoryview(data)
    assert bytes(mv[:4]) == MAGIC, "bad binlog magic"
    np_buf = np.frombuffer(data, dtype=np.uint8)
    out = DecodedBatch(image_cols, value_mode="offsets")
    res = _fast_scan(
        data, mv, np_buf, out, include, exclude, tolerate_truncation
    )
    if res is None:
        return general()
    groups, n_included, maps = res
    kinds = _kinds_from_maps(maps, include, exclude, image_cols, len(data))
    if kinds is None:
        return None, None
    if n_included < MIN_WAVEFRONT_EVENTS:
        return (
            decode_chunk(
                data, include=include, exclude=exclude,
                start_pos=start_pos, verify_crc=verify_crc,
                image_cols=image_cols, before_mode=before_mode,
                tolerate_truncation=tolerate_truncation,
                value_mode="offsets", start_after_gtid=start_after_gtid,
            ),
            kinds,
        )
    return _finish_wavefront(np_buf, out, groups, n_included, before_mode), kinds
