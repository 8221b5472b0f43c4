"""Context-window document chunking for training / retrieval corpora.

Splits each document into fixed-size sliding token windows (size ``W``,
stride ``S`` < W, so consecutive chunks overlap by ``W-S`` tokens) — the
standard pre-processing step before embedding or packing long documents
into a bounded context window.

100 TB shape: everything is built-in JVM array expressions (split →
sequence → transform/slice → posexplode) inside one narrow stage — no
shuffle at all, no Python, and the parquet scan reads only (doc_id,
text).  Chunk count per document is closed-form::

    n_chunks = 1                         if n_tokens <= W
             = ceil((n_tokens - W)/S)+1  otherwise

so the LAST window is the only short one and no window is fully
contained in its predecessor (a naive ``sequence(0, n-1, S)`` emits a
trailing start that covers no new tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (document, chunk): ``chunk_idx``, ``start_tok``,
    ``n_tokens`` (== ``window`` except for the final short chunk) and the
    re-joined ``chunk_text``.  Documents with no tokens emit no rows."""
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    toks = F.split(F.trim(F.col(text_col)), WS)
    n = F.size(toks)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.floor((n - window + stride - 1) / stride) + 1
    )
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), toks.alias("toks"), n_chunks.alias("nc")
    )
    starts = F.transform(
        F.sequence(F.lit(0), F.col("nc") - 1), lambda i: i * stride
    )
    out = base.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts,
                # slice() is 1-based; each chunk is the next `window`
                # tokens from its start (short only at document end)
                lambda s: F.slice(F.col("toks"), s + 1, window),
            )
        ).alias("chunk_idx", "chunk_toks"),
    )
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * stride).cast("int").alias("start_tok"),
        F.size("chunk_toks").cast("int").alias("n_tokens"),
        F.array_join("chunk_toks", " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
    rel: str = "documents",
) -> str:
    """DuckDB twin: identical chunk-count closed form and slicing."""
    return f"""
    WITH t AS (
      SELECT {id_col},
             string_split_regex(trim({text_col}), '\\s+') AS toks
      FROM {rel} WHERE length(trim({text_col})) > 0
    ), c AS (
      SELECT {id_col}, toks,
             CASE WHEN len(toks) <= {window} THEN 1
                  ELSE (len(toks) - {window} + {stride} - 1) // {stride} + 1
             END AS nc
      FROM t
    )
    SELECT {id_col},
           CAST(i AS INT) AS chunk_idx,
           CAST(i * {stride} AS INT) AS start_tok,
           CAST(len(toks[i*{stride}+1 : i*{stride}+{window}]) AS INT)
             AS n_tokens,
           array_to_string(toks[i*{stride}+1 : i*{stride}+{window}], ' ')
             AS chunk_text
    FROM c, UNNEST(range(nc)) AS u(i)
    """
