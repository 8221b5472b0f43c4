"""Binlog chunk source: binary files → decoded change-row DataFrame.

This is the engine's replacement for the reference's socket iterator
(EventsIterator::getIterator, src/EventsIterator.php:73-88): instead of one
fiber pulling one TCP stream, each Spark task decodes one (or more) recorded
binlog chunk files independently — chunks are self-contained (TABLE_MAP
re-emitted per chunk, mirroring the registry reset on ROTATE,
EventsIterator.php:168-169), so decode is embarrassingly parallel.

Filter pushdown staging (SURVEY.md §4): Catalyst cannot push predicates
through a Python UDF, so the include/exclude table filter and the start-LSN
skip are applied *inside* the decode task before row decode — exactly the
reference's own ordering (check before row decode,
EventsIterator.php:375-377; start-pos skip, :207-215) — and whole files
before the start file are pruned from the file listing itself.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..wire import (
    CHARSET_BINARY,
    TYPE_BIT,
    TYPE_BLOB,
    TYPE_DATE,
    TYPE_DATETIME2,
    TYPE_DOUBLE,
    TYPE_ENUM,
    TYPE_FLOAT,
    TYPE_GEOMETRY,
    TYPE_INT24,
    TYPE_JSON,
    TYPE_LONG,
    TYPE_LONGLONG,
    TYPE_NEWDECIMAL,
    TYPE_SET,
    TYPE_SHORT,
    TYPE_TIME2,
    TYPE_TIMESTAMP2,
    TYPE_TINY,
    TYPE_VARCHAR,
    WireColumn,
    decode_chunk,
    table_admitted,
)

ZERO_DATE = "0000-00-00"  # decoded sentinel → NULL at the DataFrame layer


def spark_type_of(c: WireColumn) -> str:
    """Spark SQL type carried by the decode source for a wire column —
    the full reference type table (RowFactory.php:72-165) mapped onto
    DataFrame types: exact decimals stay exact (NEWDECIMAL → DecimalType,
    unsigned BIGINT → DecimalType(20,0) like the reference's GMP string),
    temporals with calendar meaning become DATE/TIMESTAMP, and
    rendering-defined types (DATETIME2 wall time, TIME2 durations, BIT,
    ENUM/SET labels) stay strings exactly as the reference emits them."""
    t = c.ctype
    if t in (TYPE_TINY, TYPE_SHORT, TYPE_INT24):
        return "int"
    if t == TYPE_LONG:
        return "int" if c.signed else "bigint"
    if t == TYPE_LONGLONG:
        return "bigint" if c.signed else "decimal(20,0)"
    if t == TYPE_FLOAT:
        return "float"
    if t == TYPE_DOUBLE:
        return "double"
    if t == TYPE_NEWDECIMAL:
        return f"decimal({c.meta >> 8},{c.meta & 0xFF})"
    if t == TYPE_DATE:
        return "date"
    if t == TYPE_TIMESTAMP2:
        return "timestamp"
    if t in (TYPE_DATETIME2, TYPE_TIME2, TYPE_BIT, TYPE_ENUM, TYPE_SET):
        return "string"
    if t in (TYPE_VARCHAR, TYPE_BLOB):
        return "binary" if c.charset == CHARSET_BINARY else "string"
    if t in (TYPE_JSON, TYPE_GEOMETRY):
        # JSONB / SRID+WKB payloads carried opaque, like the reference's
        # BLOB fold (ColumnMetadataFactory.php:59-62, RowFactory.php:113-118)
        return "binary"
    raise ValueError(f"unsupported wire type {t:#x}")


def _pa_type(t: str):
    if t.startswith("decimal("):
        p, s = (int(x) for x in t[8:-1].split(","))
        return pa.decimal128(p, s)
    return {
        "string": pa.string(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "timestamp": pa.timestamp("us"),
        "date": pa.date32(),
        "binary": pa.binary(),
    }[t]


def _make_converter(t: str):
    """Python value list → Arrow array for one image column type."""
    patype = _pa_type(t)
    if t == "string":
        # VARCHAR/BLOB columns arrive as raw bytes slices (text_as_bytes):
        # build a binary array and cast to utf8 — validation + conversion
        # run in Arrow C++, never as Python strs.  Rendered string types
        # (DATETIME2/TIME2/BIT/ENUM/SET) arrive as str and go in directly.
        def conv(vals):
            for v in vals:
                if v is not None:
                    if isinstance(v, (bytes, bytearray)):
                        return pa.array(vals, pa.binary()).cast(patype)
                    break
            return pa.array(vals, patype)
        return conv
    if t.startswith("decimal"):
        def conv(vals):
            # NEWDECIMAL decodes to exact strings, unsigned BIGINT to ints —
            # Arrow accepts ints directly; strings go through a cast
            if any(isinstance(v, str) for v in vals):
                return pa.array(vals, pa.string()).cast(patype)
            return pa.array(vals, patype)
        return conv
    if t == "date":
        import pyarrow.compute as pc

        def conv(vals):
            arr = pa.array(vals, pa.string())
            # zero-date policy (SURVEY §7.8): sentinel → NULL
            arr = pc.if_else(
                pc.equal(arr, ZERO_DATE), pa.scalar(None, pa.string()), arr
            )
            return arr.cast(patype)
        return conv
    return lambda vals: pa.array(vals, patype)

META_COLS = [
    ("log_file", "string"),
    ("log_pos", "bigint"),
    ("server_id", "bigint"),
    ("event_ts", "timestamp"),
    ("schema_name", "string"),
    ("table_name", "string"),
    ("action", "string"),
    ("batch_seq", "int"),
    ("gtid", "string"),  # enclosing txn GTID; NULL on GTID-less logs
]

# Meta columns a consumer may ask read_binlog(null_cols=...) to emit as
# all-NULL (schema unchanged): none of these participates in LSN
# ordering, filtering, or the apply merge — nulling anything else would
# silently corrupt results, so the option is allowlisted.
NULLABLE_META = frozenset({"event_ts", "schema_name", "table_name", "gtid"})


def _load_binary(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    if isinstance(paths, str):
        return spark.read.format("binaryFile").load(paths)
    return spark.read.format("binaryFile").load(paths)


def _local_path(path: str) -> str:
    if path.startswith("file:"):
        path = path[5:]
        if path.startswith("//"):  # file://host/...
            path = path[path.index("/", 2):]
    return path


def _paths_df(spark: SparkSession, paths: list[str], n_slices: int) -> DataFrame:
    """Path list → an ``n_slices``-partition DataFrame with NO exchange
    and NO Python scan (guide §4 + §2).  The tuple-list
    ``createDataFrame`` builds a pickled Python RDD whose scan blocks
    every task on a Python-worker round trip, and the
    ``repartition(n_slices)`` that followed it added a whole extra
    stage — together ~0.25s of wall per decode query at bench scale
    (32-task stage floor on local[32]).  Instead: ``range`` natively
    creates ``n_slices`` partitions of contiguous ids and
    ``element_at`` over a constant-folded array literal maps id→path
    inside the SAME stage as the decode, so the whole decode job is one
    fused stage + the final agg.  Paths are interleaved so task t gets
    paths[t::n] — the same even spread the old RoundRobin exchange
    produced."""
    if not paths:
        return spark.createDataFrame([], "path string")
    n_slices = max(1, min(n_slices, len(paths)))
    # round-robin interleave, then contiguous range blocks ≈ paths[t::n]
    order = [p for i in range(n_slices) for p in paths[i::n_slices]]
    sep = "\x1f"
    if any(sep in p for p in order):  # pathological path names: the slow
        return spark.createDataFrame(  # but general construction
            pd.DataFrame({"path": pd.Series(order, dtype="object")})
        ).repartition(n_slices)
    # ONE py4j literal (per-element F.lit costs ~0.4ms × |paths| of
    # driver round trips); ConstantFolding collapses the split to an
    # array literal once at optimize time
    arr = F.split(F.lit(sep.join(order)), sep)
    return (
        spark.range(0, len(order), 1, n_slices)
        .select(F.element_at(arr, (F.col("id") + 1).cast("int")).alias("path"))
    )


def discover_tables(
    spark: SparkSession, chunk_glob: str | list[str],
    on_error: str = "raise",
) -> dict[tuple[str, str], list[tuple[str, str]]]:
    """Cheap first pass: read only TABLE_MAP frames of every chunk and merge
    each table's column sets across schema versions (first-seen order) —
    the distributed analog of the reference's TableMap registry (M5) plus
    evolution detection (A4).

    When a chunk has a ``.idx.json`` frame index (the generator writes
    one), only the TABLE_MAP byte ranges are read — discovery costs
    O(table maps), not O(corpus bytes).  Chunks without an index fall
    back to a row-skipping full scan."""
    import json as _json

    from ..wire import CRC_LEN, HEADER_LEN, TABLE_MAP_EVENT, _parse_table_map

    if isinstance(chunk_glob, list):
        paths = sorted(chunk_glob)
    else:
        import glob as _glob

        paths = sorted(_glob.glob(_local_path(chunk_glob)))
    n_slices = max(1, min(len(paths),
                          spark.sparkContext.defaultParallelism))
    files = _paths_df(spark, paths, n_slices)

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for path in pdf["path"]:
                local = _local_path(path)
                idx = local + ".idx.json"
                seen: dict = {}
                try:
                    seen = None
                    if os.path.exists(idx):
                        # a corrupt SIDECAR must not silently drop the
                        # chunk's schema contribution while its body
                        # still decodes (ADVICE r6): fall back to the
                        # full-decode discovery below on any index error
                        try:
                            with open(idx) as f:
                                frames = _json.load(f)
                            seen = {}
                            with open(local, "rb") as fh:
                                for fr in frames:
                                    if fr["type"] != TABLE_MAP_EVENT:
                                        continue
                                    fh.seek(fr["offset"] + HEADER_LEN)
                                    payload = fh.read(
                                        fr["size"] - HEADER_LEN - CRC_LEN
                                    )
                                    t = _parse_table_map(memoryview(payload))
                                    seen[(t.schema, t.table)] = t
                        except Exception:
                            seen = None
                    if seen is None:
                        with open(local, "rb") as fh:
                            batch = decode_chunk(
                                fh.read(), include=frozenset()
                            )
                        seen = batch.tables_seen
                except Exception:
                    # quarantine semantics: an unreadable chunk adds no
                    # schema; the decode pass will skip (or raise on) it
                    if on_error != "skip":
                        raise
                    seen = {}
                for (schema, table), t in seen.items():
                    rows.append(
                        {
                            "log_file": os.path.basename(path),
                            "schema_name": schema,
                            "table_name": table,
                            "columns": [
                                f"{c.name}:{spark_type_of(c)}" for c in t.columns
                            ],
                        }
                    )
        yield pd.DataFrame(
            rows,
            columns=["log_file", "schema_name", "table_name", "columns"],
        )

    collected = (
        files.mapInPandas(
            scan,
            schema="log_file string, schema_name string, table_name string, "
            "columns array<string>",
        )
        .collect()
    )
    merged: dict[tuple[str, str], list[tuple[str, str]]] = {}
    for r in sorted(collected, key=lambda r: r["log_file"]):
        key = (r["schema_name"], r["table_name"])
        cols = merged.setdefault(key, [])
        seen = {c[0] for c in cols}
        for spec in r["columns"]:
            name, typ = spec.split(":", 1)
            if name not in seen:
                cols.append((name, typ))
                seen.add(name)
    return merged


def decoded_schema_ddl(image_cols: list[tuple[str, str]]) -> str:
    parts = [f"{n} {t}" for n, t in META_COLS]
    parts += [f"before_{n} {t}" for n, t in image_cols]
    parts += [f"after_{n} {t}" for n, t in image_cols]
    return ", ".join(parts)


def read_binlog(
    spark: SparkSession,
    chunk_glob: str | list[str],
    image_cols: list[tuple[str, str]] | None = None,
    include: set[tuple[str, str]] | None = None,
    exclude: set[tuple[str, str]] | None = None,
    start_lsn: tuple[str, int] | None = None,
    start_after_gtid: tuple[str, int] | dict[str, int] | None = None,
    verify_crc: bool = False,
    files_df: DataFrame | None = None,
    before_mode: str = "full",
    task_side_read: bool = True,
    tolerate_truncation: bool = False,
    vectorize: bool = True,
    on_error: str = "raise",
    null_cols: frozenset[str] | set[str] | None = None,
) -> DataFrame:
    """Decode binlog chunks into a flat change-row DataFrame.

    ``on_error``: 'raise' (default — a corrupt chunk fails the job) or
    'skip' — quarantine semantics: a chunk whose decode raises is
    dropped WHOLE (chunks are the atomicity unit; partial rows from a
    corrupt chunk are worse than none) and the rest of the log decodes
    normally.  Pair with ``validate_chunks`` for the per-chunk report
    of what was skipped and why.

    Output schema: LSN + routing metadata columns (META_COLS) plus
    ``before_*`` / ``after_*`` image columns.  ``image_cols`` defaults to
    the union discovered from TABLE_MAP frames of the included tables.

    ``task_side_read``: open the chunk inside the Python task instead of
    shipping its bytes through the JVM scan + Arrow IPC (the content is
    the whole data volume — reading it task-side halves the decode path's
    data movement).  Requires chunks readable from every worker (local FS
    here; NFS/fuse mounts on a cluster — set False to route bytes through
    Spark's Hadoop FS layer instead).

    ``vectorize``: use the offset-scan kernels + numpy/Arrow column
    gathers when every included table's stored columns allow it (decided
    per chunk from a TABLE_MAP pre-scan; chunks with decimal / rendered
    temporal / ENUM / latin1 / FLOAT columns fall back to the compiled
    value loops automatically).

    ``null_cols``: emit these metadata columns as all-NULL instead of
    their decoded values — the output SCHEMA is unchanged, only the
    values are dropped.  For consumers that provably never read them
    (the apply/replay path), this skips building + Arrow-IPC-shipping +
    JVM-converting ~300 MB of repeated strings per 5.8 M events (gtid
    alone is ~40 chars/row; guide §4 — pass only the columns the
    function needs across the Python boundary).  Restricted to
    ``NULLABLE_META`` so LSN/action/routing correctness can't be
    clobbered by mistake.
    """
    if null_cols:
        bad = set(null_cols) - NULLABLE_META
        if bad:
            raise ValueError(
                f"null_cols must be a subset of {sorted(NULLABLE_META)}; "
                f"got extra {sorted(bad)}"
            )
    nulled = frozenset(null_cols or ())
    if image_cols is None:
        discovered = discover_tables(spark, chunk_glob, on_error=on_error)
        keys = [
            k
            for k in discovered
            if table_admitted(k[0], k[1], include, exclude)
        ]
        image_cols = []
        seen: set[str] = set()
        for k in sorted(keys):
            for name, typ in discovered[k]:
                if name not in seen:
                    image_cols.append((name, typ))
                    seen.add(name)
    ddl = decoded_schema_ddl(image_cols)
    ts_cols = {n for n, t in image_cols if t == "timestamp"}

    if files_df is not None:
        files = files_df
    elif task_side_read:
        # path-list fast path: tasks read chunk bytes themselves, so the
        # JVM binaryFile source would only contribute its (expensive)
        # Hadoop file listing — ~40% of decode wall time at bench scale.
        # Driver-side glob + an even repartition replaces it.
        import glob as _glob

        if isinstance(chunk_glob, list):
            paths = sorted(chunk_glob)
        else:
            local = chunk_glob
            if local.startswith("file:"):
                local = local[5:]
                if local.startswith("//"):
                    local = local[local.index("/", 2):]
            paths = sorted(_glob.glob(local))
        # slice policy: every Python-runner task costs ~15-30ms of
        # dispatch, so aim for ≥64MB of chunk bytes per task, floored at
        # one wave (defaultParallelism) and capped at one file per task —
        # at cluster scale (GB-sized chunks) this degenerates to
        # one-task-per-file, at bench scale it avoids paying the task
        # floor 3x over.  (Round 7 note: a 2-wave floor was measured and
        # REJECTED — interleaved quiet-box A/B put one wave at 1.98s vs
        # 2.32s for two waves on the 1200-chunk decode; extra waves only
        # helped under external load, where the freed cores mask noise.)
        total_bytes = 0
        for p in paths:
            try:
                total_bytes += os.path.getsize(p)
            except OSError:
                pass
        cores = spark.sparkContext.defaultParallelism
        n_slices = max(1, min(
            len(paths),
            max(cores, -(-total_bytes // (64 * 1024 * 1024))),
        ))
        files = _paths_df(spark, paths, n_slices)
    else:
        files = _load_binary(spark, chunk_glob)
    if start_lsn is not None:
        # file-level pruning before any decode (reference's start-pos skip,
        # EventsIterator.php:207-215, lifted to scan pruning)
        start_file, start_pos = start_lsn
        files = files.filter(
            F.element_at(F.split(F.col("path"), "/"), -1) >= start_file
        )
    else:
        start_file, start_pos = "", 0

    col_names = [n for n, _ in image_cols]
    converters = [_make_converter(t) for _, t in image_cols]
    pa_types = [_pa_type(t) for _, t in image_cols]

    def decode(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # Arrow-native emission: column lists from the compiled decoder go
        # straight into pa.array() — no pandas object Series in between.
        import numpy as np

        from .vector import materialize_column
        from .wavefront import decode_chunk_vectorized

        for rb in it:
            paths = rb.column(rb.schema.get_field_index("path")).to_pylist()
            if not task_side_read:
                contents = rb.column(rb.schema.get_field_index("content"))
            for row_i, path in enumerate(paths):
                name = os.path.basename(path)
                sp = start_pos if name == start_file else 0
                if task_side_read:
                    local = path
                    if local.startswith("file:"):
                        local = local[5:]
                        if local.startswith("//"):  # file://host/...
                            local = local[local.index("/", 2):]
                    with open(local, "rb") as fh:
                        data = fh.read()
                else:
                    data = contents[row_i].as_py()
                try:
                    batch, kinds = (
                        decode_chunk_vectorized(
                            data,
                            image_cols=col_names,
                            include=include,
                            exclude=exclude,
                            start_pos=sp,
                            verify_crc=verify_crc,
                            before_mode=before_mode,
                            tolerate_truncation=tolerate_truncation,
                            start_after_gtid=start_after_gtid,
                        )
                        if vectorize
                        else (None, None)
                    )
                    if batch is None:
                        batch = decode_chunk(
                            data,
                            include=include,
                            exclude=exclude,
                            start_pos=sp,
                            verify_crc=verify_crc,
                            image_cols=col_names,
                            before_mode=before_mode,
                            text_as_bytes=True,
                            tolerate_truncation=tolerate_truncation,
                            start_after_gtid=start_after_gtid,
                        )
                except Exception:
                    if on_error == "skip":
                        # quarantine: the chunk is the atomicity unit —
                        # drop it whole, decode the rest of the log
                        continue
                    raise
                n = len(batch)
                m = batch.meta_numpy()  # np.repeat expansion, not per-row
                # String meta columns: encode once per EVENT, then a
                # C-side Arrow take gathers per row — no per-row Python
                # objects, no per-row UTF-8 encode (a GTID repeats across
                # every row of its transaction; round-6 fix for the
                # r5 decode_binary regression).
                codes = pa.array(m["codes"], pa.int64())
                take = lambda vals: pa.array(vals, pa.string()).take(codes)  # noqa: E731
                # null_cols meta columns skip the build AND the Arrow
                # IPC + JVM row-conversion downstream (validity bitmap
                # only) — the apply path nulls event_ts/schema_name/
                # table_name/gtid it never reads (guide §4)
                nstr = lambda name_, mk: (  # noqa: E731
                    pa.nulls(n, pa.string()) if name_ in nulled else mk()
                )
                arrays = [
                    # constant column via C-side take (a [name]*n python
                    # list costs ~1.4ms/chunk; this is ~0.04ms)
                    pa.array([name], pa.string()).take(
                        pa.array(np.zeros(n, np.int64))
                    ),
                    pa.array(m["log_pos"], pa.int64()),
                    pa.array(m["server_id"], pa.int64()),
                    (pa.nulls(n, pa.timestamp("us"))
                     if "event_ts" in nulled
                     else pa.array(m["ts_us"], pa.timestamp("us"))),
                    nstr("schema_name", lambda: take(m["ev_schema"])),
                    nstr("table_name", lambda: take(m["ev_table"])),
                    take(m["ev_action"]),
                    pa.array(m["batch_seq"], pa.int32()),
                    nstr("gtid", lambda: take(m["ev_gtid"])),
                ]
                names = [n_ for n_, _ in META_COLS]
                if kinds is not None:
                    np_buf = np.frombuffer(data, dtype=np.uint8)
                    for side, cols_ in (("before", batch.before_cols),
                                        ("after", batch.after_cols)):
                        for j, c in enumerate(col_names):
                            arrays.append(
                                materialize_column(
                                    np_buf, kinds.get(c), cols_[j], n,
                                    pa_types[j],
                                )
                            )
                            names.append(f"{side}_{c}")
                else:
                    for side, cols_ in (("before", batch.before_cols),
                                        ("after", batch.after_cols)):
                        for j, c in enumerate(col_names):
                            arrays.append(converters[j](cols_[j]))
                            names.append(f"{side}_{c}")
                yield pa.RecordBatch.from_arrays(arrays, names=names)

    cols_in = ["path"] if task_side_read else ["path", "content"]
    return files.select(*cols_in).mapInArrow(decode, schema=ddl)


def image_view(df: DataFrame, image_cols: list[str]) -> DataFrame:
    """Collapse before/after into the event's effective row image
    (after for insert/update, before for delete) — the shape the apply
    stage and the reference's JSON emission both use.

    Selection is by ``action``, NOT per-column coalesce: an UPDATE that
    sets a column to NULL must yield NULL, not resurrect the stale
    before-image value (it's the whole after image or the whole before
    image, exactly like the reference's per-event JSON)."""
    is_delete = F.col("action") == "delete"
    out = df
    for c in image_cols:
        out = out.withColumn(
            c,
            F.when(is_delete, F.col(f"before_{c}")).otherwise(
                F.col(f"after_{c}")
            ),
        )
    return out.drop(*[f"after_{c}" for c in image_cols],
                    *[f"before_{c}" for c in image_cols])


def validate_chunks(
    spark: SparkSession,
    chunk_paths: list[str],
    include: set | None = None,
    exclude: set | None = None,
    verify_crc: bool = True,
) -> DataFrame:
    """Operational pre-flight / quarantine report: attempt a full decode
    of every chunk (CRC on) and report per chunk ``(chunk, ok, n_rows,
    reason)`` — the triage a replay operator runs before (or after)
    ``read_binlog(on_error='skip')`` to know exactly what was dropped
    and why.  Reasons are coarse deterministic classes, not message
    text: 'crc' (checksum mismatch), 'truncated' (frame extends past
    the file), 'malformed' (anything else the decoder rejects).

    One task per chunk slice; each failure is contained to its row —
    the report never throws."""
    import pandas as pd_mod

    paths = sorted(chunk_paths)
    files = _paths_df(
        spark, paths,
        max(1, min(len(paths), spark.sparkContext.defaultParallelism)),
    )

    def check(batches):
        from ..wire import decode_chunk as _dc

        from ..wire import CrcMismatchError, TruncatedFrameError

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                # classification by EXCEPTION TYPE (ADVICE r6): an
                # unrelated error whose message merely contains 'crc'
                # can no longer masquerade as corruption, and I/O
                # failures get their own 'unreadable' class
                try:
                    with open(_local_path(path), "rb") as fh:
                        data = fh.read()
                except OSError:
                    rows.append(
                        (os.path.basename(path), False, 0, "unreadable")
                    )
                    continue
                try:
                    batch = _dc(
                        data, include=include, exclude=exclude,
                        verify_crc=verify_crc, text_as_bytes=True,
                    )
                    rows.append(
                        (os.path.basename(path), True, len(batch), None)
                    )
                except CrcMismatchError:
                    rows.append((os.path.basename(path), False, 0, "crc"))
                except TruncatedFrameError:
                    rows.append(
                        (os.path.basename(path), False, 0, "truncated")
                    )
                except Exception:  # contained: one row per failure
                    rows.append(
                        (os.path.basename(path), False, 0, "malformed")
                    )
            yield pd_mod.DataFrame(
                rows, columns=["chunk", "ok", "n_rows", "reason"]
            )

    return files.mapInPandas(
        check, "chunk string, ok boolean, n_rows bigint, reason string"
    )
