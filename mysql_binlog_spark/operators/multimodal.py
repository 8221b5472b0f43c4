"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real 100 TB transcript lakes carry image/audio/video turns as ``binary``
columns with metadata structs.  The image/audio codecs are not in this
container, so the *decode kernels* are stubs behind a clearly-marked
switch (NotImplementedError or a deterministic fake) — but everything
Spark-side is real and tested: the binary column schema, the Arrow batch
shape through ``mapInPandas``, partition-preserving frame explosion, and
the metadata expressions (all JVM builtins).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_DECODE = True  # no PIL/ffmpeg in this container


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize the multimodal shape from a text corpus: payload bytes +
    typed metadata (what an ingest job would carry for real media)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
            (F.pmod(F.length(payload), F.lit(3))).cast("int").alias("codec_id"),
        ).alias("media_meta"),
    )


def decode_frames(
    media: DataFrame,
    frames_per_doc: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sample "decode": binary payload → per-frame feature rows via
    ``mapInPandas`` (Arrow batches; one output row per sampled frame).

    With FAKE_DECODE the kernel derives deterministic features from the
    raw bytes (mean/max of the byte window) so the distributed plumbing —
    batch iteration, explosion, schema — is fully exercised; swap the
    kernel for a real codec where available.
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not FAKE_DECODE:  # pragma: no cover
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg; not in this container"
            )
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "feat_mean": [],
                    "feat_max": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = max(1, len(buf) // frames_per_doc)
                for fi in range(frames_per_doc):
                    win = buf[fi * n : (fi + 1) * n]
                    if len(win) == 0:
                        win = buf[-1:]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(fi)
                    rows["feat_mean"].append(float(win.mean()))
                    rows["feat_max"].append(int(win.max()))
                    rows["frame_bytes"].append(int(len(win)))
            yield pd.DataFrame(rows)

    return media.select(id_col, "payload").mapInPandas(
        kernel,
        schema="doc_id long, frame_idx int, feat_mean double, "
        "feat_max int, frame_bytes int",
    )
