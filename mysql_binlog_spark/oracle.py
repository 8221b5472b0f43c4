"""Pure-pandas reference applier — the golden oracle for replay tests.

~50 lines of obviously-correct single-threaded code implementing the
reference's apply semantics (last event wins in binlog order; the order the
reference guarantees by construction, EventsIterator.php:175-196): an
in-memory dict keyed by (conv_id, turn_idx), applied in strict LSN order.
Spark results must match this exactly (SURVEY.md §5.2.1).
"""

from __future__ import annotations

import pandas as pd


def apply_changelog(
    changelog: pd.DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    payload_cols: tuple[str, ...] = ("role", "text", "tool", "tool_version", "ts"),
    lsn_cols: tuple[str, ...] = ("log_file", "log_pos", "server_id"),
    include: tuple[str, str] | None = ("app", "transcripts"),
) -> pd.DataFrame:
    """Sequentially apply a decoded change log; return final table state."""
    df = changelog
    if include is not None and "schema_name" in df.columns:
        df = df[(df["schema_name"] == include[0]) & (df["table_name"] == include[1])]
    sort_cols = [c for c in lsn_cols if c in df.columns]
    if "batch_seq" in df.columns:
        sort_cols = sort_cols[:2] + ["batch_seq"] + sort_cols[2:]
    df = df.sort_values(sort_cols, kind="mergesort")
    state: dict[tuple, dict] = {}
    seen_lsn: set[tuple] = set()
    for row in df.to_dict("records"):
        lsn = tuple(row[c] for c in sort_cols)
        if lsn in seen_lsn:  # exact re-delivery
            continue
        seen_lsn.add(lsn)
        key = tuple(row[c] for c in key_cols)
        if row["action"] == "delete":
            state.pop(key, None)
        else:
            state[key] = {c: row.get(c) for c in payload_cols}
    out_rows = [
        dict(zip(key_cols, k)) | v for k, v in sorted(state.items())
    ]
    cols = list(key_cols) + list(payload_cols)
    return pd.DataFrame(out_rows, columns=cols)
