"""Emission sinks beyond the lake table.

The reference's primary output is JSON-serialized events
(Event::jsonSerialize, e.g. WriteRows.php:27-33 — injects the ``action``
discriminator, strips wire bitmaps; printed by
examples/print-row-events.php:38-41).  Here that becomes a debug/bridge
sink: one JSON document per change event, suitable for
``writeStream.format("json")`` or hand-off to Kafka-style sinks — the
"send it anywhere" half the reference leaves to the user (README.md:3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_json_events(decoded: DataFrame, image_cols: list[str]) -> DataFrame:
    """One JSON string per change row, shaped like the reference's event
    JSON: action + position + before/after images (absent sides omitted —
    jsonSerialize drops null members the same way)."""
    before = F.struct(*[F.col(f"before_{c}").alias(c) for c in image_cols])
    after = F.struct(*[F.col(f"after_{c}").alias(c) for c in image_cols])
    doc = F.struct(
        F.col("action"),
        F.struct(
            F.col("log_file").alias("file"), F.col("log_pos").alias("position")
        ).alias("position"),
        F.col("server_id"),
        F.col("schema_name").alias("schema"),
        F.col("table_name").alias("table"),
        F.when(F.col("action") != "insert", before).alias("before"),
        F.when(F.col("action") != "delete", after).alias("after"),
    )
    return decoded.select(
        F.to_json(doc, {"ignoreNullFields": "true"}).alias("json")
    )


def write_json_sink(decoded: DataFrame, image_cols: list[str], path: str) -> None:
    """Batch JSON emission (debug sink)."""
    to_json_events(decoded, image_cols).write.mode("overwrite").text(path)
