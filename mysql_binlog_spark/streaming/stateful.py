"""Custom stateful streaming operator: per-conversation progress state.

The reference keeps exactly one piece of cross-event state — the TableMap
registry + running position (EventsIterator.php:40-47).  At transcript
scale the analogous *keyed* state is per-conversation progress: how many
change events a conversation has absorbed, its highest turn, and the last
LSN applied — the bookkeeping a CDC consumer needs to detect gaps or
stalls per key.

Built on ``applyInPandasWithState`` (Arrow-batched, grouped state), the
Structured-Streaming primitive for state the built-in aggregations can't
express.  State per conv_id: (n_events, max_turn, last LSN); each
micro-batch emits the updated row per touched conversation.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, max_turn int, last_file string, last_pos long"
OUTPUT_SCHEMA = (
    "conv_id string, n_events long, max_turn int, "
    "last_file string, last_pos long"
)


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_events, max_turn, last_file, last_pos = state.get
    else:
        n_events, max_turn, last_file, last_pos = 0, -1, "", 0
    for pdf in pdfs:
        n_events += len(pdf)
        max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        tail = pdf.sort_values(["log_file", "log_pos"]).iloc[-1]
        if (str(tail["log_file"]), int(tail["log_pos"])) > (last_file, last_pos):
            last_file, last_pos = str(tail["log_file"]), int(tail["log_pos"])
    state.update((n_events, max_turn, last_file, last_pos))
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_events": n_events,
                "max_turn": max_turn,
                "last_file": last_file,
                "last_pos": last_pos,
            }
        ]
    )


def conv_progress(changes: DataFrame) -> DataFrame:
    """Streaming per-conversation progress (update-mode output: one row per
    touched conv per micro-batch carrying cumulative state)."""
    return (
        changes.select("conv_id", "turn_idx", "log_file", "log_pos")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
