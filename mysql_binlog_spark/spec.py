"""Deterministic CDC-log derivation shared by the engine and its oracle.

The driver's correctness gate runs each Spark query side-by-side with an
ANSI-SQL oracle on DuckDB over the same parquet tables.  To test CDC
semantics that way, we derive a synthetic change-event log over a
``transcripts`` table (the BASELINE.json input hint:
``conv_id, turn_idx, role, text, tool, ts``) **deterministically from the
driver's ``events`` table** — no RNG, no wall clock — using ONE SQL template
rendered for both dialects, so Spark and DuckDB compute identical rows by
construction.

The derived log models every scenario segment of FIXTURES.md §4:

* inserts/updates (first event for a key is the insert; rule mirrors the
  reference's action discriminator, WriteRows.php:14 / UpdateRows.php:14),
* deletes (``event_id % 37 == 0``),
* exact duplicate re-delivery (``event_id % 101 == 0`` rows unioned twice,
  same LSN — exercises dropDuplicates, north-rule A1),
* hot-key skew (~30% of events hit ``conv_hot``),
* include/exclude filter noise (``other_db`` / ``ignore_me`` rows,
  EventsIterator.php:103-130 semantics),
* schema evolution (``tool_version`` non-NULL only for
  ``event_id >= evo_event`` — "new tool/role fields", BASELINE.json:6).

LSN columns follow the reference's BinlogPosition model
(src/BinlogPosition.php:9-14): ``log_file`` rotates every
``events_per_file`` events; ``log_pos`` is strictly monotone within a file.
"""

from __future__ import annotations

EVENTS_PER_FILE = 2500
SERVER_ID = 666
ROW_EVENT_STRIDE = 128  # synthetic byte stride between events in a file

# GTID lineage (beyond-parity superset; the reference skips GTID frames,
# EventsIterator.php:244-253).  TWO source-server SIDs — the common
# multi-source-replication topology (round 6): a transaction's SID is
# ``xid % 2`` and its GNO is ``xid // 2 + 1`` (1-based, contiguous per
# SID, exactly as a real server numbers them).  The fixture generator
# writes a GTID_LOG_EVENT per transaction and the decoder re-derives the
# same text — so the oracle can compute it from xid alone.
GTID_SID_HEX = "00000000000040008000000000000666"
GTID_SID2_HEX = "00000000000040008000000000000667"


def _hex_to_uuid(h: str) -> str:
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


GTID_UUID = _hex_to_uuid(GTID_SID_HEX)
GTID_UUID2 = _hex_to_uuid(GTID_SID2_HEX)


def gtid_expr(dialect: str, xid_expr: str) -> str:
    """SQL for the GTID text the decoder emits:
    '<sid-uuid[xid % 2]>:<xid // 2 + 1>'."""
    cast = "VARCHAR" if dialect == "duckdb" else "STRING"
    gno = _idiv(dialect, f"({xid_expr})", "2")
    return (
        f"CASE WHEN ({xid_expr}) % 2 = 0 THEN '{GTID_UUID}:' "
        f"ELSE '{GTID_UUID2}:' END || CAST({gno} + 1 AS {cast})"
    )


def gtid_gno_expr(dialect: str, xid_expr: str) -> str:
    """SQL for the GNO alone (resume-threshold comparisons)."""
    return f"({_idiv(dialect, f'({xid_expr})', '2')} + 1)"

# key space / content knobs (all pure functions of event_id / user_id)
N_TURNS = 40
DELETE_MOD = 37
DUP_MOD = 101
HOT_MOD = 10
HOT_LT = 3  # event_id % 10 < 3  → ~30% of events hit conv_hot
OTHER_DB_MOD = 53
IGNORE_TABLE_MOD = 59


def _idiv(dialect: str, a: str, b: str) -> str:
    return f"({a} // {b})" if dialect == "duckdb" else f"({a} div {b})"


def changelog_sql(
    dialect: str,
    events_rel: str = "events",
    events_per_file: int = EVENTS_PER_FILE,
    with_duplicates: bool = True,
) -> str:
    """The full derived change log (one row per change event).

    Columns: log_file, log_pos, server_id, xid, ts, schema_name, table_name,
    action, conv_id, turn_idx, role, text, tool, tool_version.

    ``with_duplicates`` unions an exact re-delivery of every
    ``event_id % DUP_MOD == 0`` row (same LSN) — the dedup fixture.
    """
    assert dialect in ("spark", "duckdb")
    idiv = lambda a, b: _idiv(dialect, a, b)  # noqa: E731

    file_idx = idiv("e.event_id", str(events_per_file))
    # scalar subquery, NOT a CROSS JOIN: Spark precomputes it as a reused
    # subquery result (a literal in the plan) instead of a 1-row
    # BroadcastNestedLoopJoin — keeps every derived plan join-free
    evo_event = (
        f"(SELECT {_idiv(dialect, '(MAX(event_id) + 1)', '2')} "
        f"FROM {events_rel})"
    )
    base = f"""
    WITH derived AS (
      SELECT
        printf('binlog.%06d', 1 + {file_idx}) AS log_file,
        CAST(4 + (e.event_id % {events_per_file}) * {ROW_EVENT_STRIDE} AS BIGINT)
          AS log_pos,
        CAST({SERVER_ID} AS BIGINT) AS server_id,
        CAST({idiv("e.event_id", "10")} AS BIGINT) AS xid,
        e.ts AS ts,
        CASE WHEN e.event_id % {OTHER_DB_MOD} = 0 THEN 'other_db' ELSE 'app' END
          AS schema_name,
        CASE WHEN e.event_id % {IGNORE_TABLE_MOD} = 0 THEN 'ignore_me'
             ELSE 'transcripts' END AS table_name,
        CASE WHEN e.event_id % {HOT_MOD} < {HOT_LT} THEN 'conv_hot'
             ELSE printf('conv_%05d', e.user_id) END AS conv_id,
        CAST(e.event_id % {N_TURNS} AS INT) AS turn_idx,
        CASE CAST(e.event_id % 4 AS INT)
          WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
          WHEN 2 THEN 'system' ELSE 'tool' END AS role,
        e.event_type || ' turn ' || CAST(e.event_id AS STRING) ||
          CASE WHEN e.event_id % 13 = 0 THEN ' émoji ✓' ELSE '' END AS text,
        CASE WHEN e.event_id % 4 = 3
             THEN 'tool_' || CAST(e.event_id % 7 AS STRING)
             ELSE NULL END AS tool,
        CASE WHEN e.event_id >= {evo_event} AND e.event_id % 4 = 3
             THEN 'v' || CAST(e.event_id % 3 AS STRING)
             ELSE NULL END AS tool_version,
        CASE WHEN e.event_id % {DELETE_MOD} = 0 THEN 'delete' ELSE NULL END
          AS forced_action,
        e.event_id AS event_id
      FROM {events_rel} e
    ),
    tagged AS (
      SELECT
        log_file, log_pos, server_id, xid, ts, schema_name, table_name,
        COALESCE(
          forced_action,
          CASE WHEN ROW_NUMBER() OVER (
                 PARTITION BY schema_name, table_name, conv_id, turn_idx
                 ORDER BY event_id) = 1
               THEN 'insert' ELSE 'update' END
        ) AS action,
        conv_id, turn_idx, role, text, tool, tool_version, event_id
      FROM derived
    )
    """
    if dialect == "duckdb":
        base = base.replace("AS STRING", "AS VARCHAR")
    select_cols = (
        "log_file, log_pos, server_id, xid, ts, schema_name, table_name, "
        "action, conv_id, turn_idx, role, text, tool, tool_version"
    )
    if with_duplicates:
        return (
            base
            + f"""
    SELECT {select_cols} FROM tagged
    UNION ALL
    SELECT {select_cols} FROM tagged WHERE event_id % {DUP_MOD} = 0
    """
        )
    return base + f"\n    SELECT {select_cols} FROM tagged\n"


TYPED_SAMPLE_MOD = 5
TYPED_ROWS_PER_FILE = 500


def typed_rows_sql(dialect: str, events_rel: str = "events") -> str:
    """Deterministic rows for the 16-wire-type fixture (VERDICT round-1 #1:
    carry every reference type through the DataFrame source).

    One template, two dialects: the Spark rendering feeds the fixture
    encoder (these are the wire-input values), the DuckDB rendering is the
    decode oracle.  Every value is a pure function of ``event_id``;
    string-rendered values (decimal, temporal, bit, enum, set) are built
    with printf so both engines produce byte-identical strings.

    NULL coverage: c_dec (e%11), c_date (e%13 NULL, e%19 zero-date
    sentinel), c_enum (e%17) — exercising the null bitmap and the
    zero-date → NULL source policy (SURVEY §7.8).
    """
    assert dialect in ("spark", "duckdb")
    idiv = lambda a, b: _idiv(dialect, a, b)  # noqa: E731
    e = "e.event_id"
    v_dec = f"(({e} * 37) % 1000000000)"
    sql = f"""
    SELECT
      {e} AS row_id,
      printf('typed.%06d',
             1 + {idiv(idiv(e, str(TYPED_SAMPLE_MOD)), str(TYPED_ROWS_PER_FILE))})
        AS log_file,
      CAST(({e} % 251) - 125 AS INT) AS c_tiny,
      CAST({e} % 256 AS INT) AS c_utiny,
      CAST((({e} * 17) % 60001) - 30000 AS INT) AS c_short,
      CAST((({e} * 131) % 16000001) - 8000000 AS INT) AS c_int24,
      CAST((({e} * 7919) % 4000000001) - 2000000000 AS INT) AS c_long,
      CAST({e} * 1000003 - 5000000000 AS BIGINT) AS c_big,
      CAST(CAST('9223372036854775808' AS DECIMAL(20,0)) + {e}
           AS DECIMAL(20,0)) AS c_ubig,
      CAST(({e} % 1000) + 0.5 AS FLOAT) AS c_float,
      CAST({e} * 0.25 AS DOUBLE) AS c_double,
      CASE WHEN {e} % 11 = 0 THEN NULL
           ELSE printf('%s%d.%03d',
                       CASE WHEN {e} % 2 = 1 THEN '-' ELSE '' END,
                       {idiv(v_dec, '1000')}, {v_dec} % 1000) END AS c_dec,
      CASE WHEN {e} % 13 = 0 THEN NULL
           WHEN {e} % 19 = 0 THEN '0000-00-00'
           ELSE printf('2023-%02d-%02d', 1 + {e} % 12, 1 + {e} % 28) END
        AS c_date,
      printf('2024-03-%02d %02d:%02d:%02d.%03d',
             1 + {e} % 28, {e} % 24, ({e} * 3) % 60, ({e} * 7) % 60,
             {e} % 1000) AS c_dt,
      printf('%s%02d:%02d:%02d.%02d',
             CASE WHEN {e} % 5 = 0 THEN '-' ELSE '' END,
             {e} % 100, ({e} * 11) % 60, 1 + ({e} * 7) % 59, {e} % 100)
        AS c_time,
      lpad(bin({e} % 256), 8, '0') AS c_bit,
      CASE WHEN {e} % 17 = 0 THEN NULL
           WHEN {e} % 3 = 0 THEN 'alpha'
           WHEN {e} % 3 = 1 THEN 'beta' ELSE 'gamma' END AS c_enum,
      substr(
        CASE WHEN ({e} % 8) & 1 = 1 THEN ',x' ELSE '' END ||
        CASE WHEN ({e} % 8) & 2 = 2 THEN ',y' ELSE '' END ||
        CASE WHEN ({e} % 8) & 4 = 4 THEN ',z' ELSE '' END, 2) AS c_set,
      printf('név_%d ✓', {e}) AS c_varchar,
      repeat('lorem ', CAST({e} % 7 AS INT)) || printf('doc %d', {e})
        AS c_blob,
      unhex(md5(printf('%d', {e}))) AS c_bin,
      CASE WHEN {e} % 23 = 0 THEN NULL
           ELSE printf('{{"id": %d, "tag": "t%d"}}', {e}, {e} % 5) END
        AS c_json,
      unhex(md5(printf('g%d', {e}))) AS c_geom,
      CASE WHEN {e} % 29 = 0 THEN NULL
           ELSE printf('smörgås_%d €±ÿ', {e}) END AS c_latin1
    FROM {events_rel} e
    WHERE {e} % {TYPED_SAMPLE_MOD} = 0
    """
    return sql


def dedup_sql(dialect: str, events_rel: str = "events") -> str:
    """LSN-dedup (north-rule A1, first half): drop exact re-deliveries by
    (log_file, log_pos, server_id).  Equals the no-duplicates changelog."""
    return changelog_sql(dialect, events_rel, with_duplicates=False)


def last_writer_sql(
    dialect: str,
    events_rel: str = "events",
    include_schema: str = "app",
    include_table: str = "transcripts",
) -> str:
    """Per-key last-LSN winner over the filtered changelog (north-rule A1,
    second half): mirrors groupBy(key).agg(max_by(..., lsn))."""
    inner = changelog_sql(dialect, events_rel, with_duplicates=False)
    return f"""
    WITH changelog AS ({inner})
    SELECT conv_id, turn_idx, action, role, text, tool, tool_version, ts,
           log_file, log_pos
    FROM (
      SELECT c.*,
             ROW_NUMBER() OVER (
               PARTITION BY conv_id, turn_idx
               ORDER BY log_file DESC, log_pos DESC, server_id DESC) AS rn
      FROM changelog c
      WHERE schema_name = '{include_schema}' AND table_name = '{include_table}'
    ) w
    WHERE rn = 1
    """


def final_state_sql(dialect: str, events_rel: str = "events") -> str:
    """Applied table state: last-writer winners minus deletes — what the
    lake table must contain after a full replay (the north rule's
    'reference final table state')."""
    inner = last_writer_sql(dialect, events_rel)
    return f"""
    WITH winners AS ({inner})
    SELECT conv_id, turn_idx, role, text, tool, tool_version, ts
    FROM winners WHERE action <> 'delete'
    """
