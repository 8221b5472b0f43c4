"""Property tests for the batched text/image kernels (round 6).

Two cross-engine fuzz suites:

* BPE: the JVM/DuckDB replace-chain tokenizer vs an INDEPENDENT classic
  BPE implementation (iterate: merge the lowest-rank adjacent pair) —
  proves the ␟-wrapped rendering is the exact algorithm, not an
  approximation.  The round-6 fix this guards: a space-prefixed
  rendering prefix-matched merge operands against longer tokens
  (" Ġ in" fused inside " Ġ ing"), silently diverging from real BPE.
* BMP: encode → decode round trip over random planes and shapes,
  including widths whose 3-byte rows need real stride padding.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_binlog_spark.functions.text import (
    BPE_MERGES,
    SPACE_MARK,
    TOK_DELIM,
    _bpe_merges_checked,
    bpe_token_count_sql,
)
from mysql_binlog_spark.operators.multimodal import (
    decode_bmp24_gray,
    encode_bmp24,
)


def classic_bpe(text: str) -> list[str]:
    """Reference classic BPE: repeatedly merge the lowest-rank adjacent
    pair, leftmost-first within a rank — the Sennrich/GPT-2 algorithm,
    implemented with none of the production code's string tricks."""
    s = text.lower().replace(TOK_DELIM, "").replace(" ", SPACE_MARK)
    toks = list(s)
    rank = {pair: i for i, pair in enumerate(BPE_MERGES)}
    while len(toks) > 1:
        pairs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
        cand = [p for p in pairs if p in rank]
        if not cand:
            break
        a, b = min(cand, key=lambda p: rank[p])
        out, i = [], 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_bpe_merge_table_invariants():
    # operands are chars or earlier outputs; outputs pairwise distinct —
    # together these make rank-order-to-fixpoint ≡ classic priority BPE
    # (see functions/text.py), so the fuzz below is expected to pass.
    assert _bpe_merges_checked() is BPE_MERGES


# Alphabet biased toward merge-operand letters so merges actually fire,
# plus digits (00/10/20 rules), spaces, and a few never-merged chars.
_BPE_ALPHABET = "thinerasoulgdcwmpfbx 012E" + SPACE_MARK


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_BPE_ALPHABET, max_size=60))
def test_bpe_duckdb_twin_matches_classic(text):
    import duckdb

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {bpe_token_count_sql('t')} FROM (SELECT ? AS t)", [text]
    ).fetchone()[0]
    assert got == len(classic_bpe(text)), text


def test_bpe_spark_matches_duckdb_and_classic(spark):
    import duckdb

    from pyspark.sql import functions as F

    from mysql_binlog_spark.functions.text import bpe_token_count

    texts = [
        "x ing",                      # the prefix-fusion regression case
        "the thing",
        "station in outer ring",      # the suffix-fusion regression case
        "nothing was found",
        "the the the",
        "100 2000 est ation",
        "",
        " ",
        "a",
        f"delimiter {TOK_DELIM} injection {TOK_DELIM}{TOK_DELIM}",
        "Ġ raw space mark",
        "MIXED Case THE Thing",
        "was the station thing outstanding",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select("i", bpe_token_count(F.col("t")).alias("n")).collect()
    spark_counts = {r["i"]: r["n"] for r in rows}
    con = duckdb.connect()
    sql = bpe_token_count_sql("t")
    for i, t in enumerate(texts):
        want = len(classic_bpe(t))
        duck = con.execute(f"SELECT {sql} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        assert spark_counts[i] == want, (t, spark_counts[i], want)
        assert duck == want, (t, duck, want)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=23),   # widths spanning stride pads 0..3
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_roundtrip_fuzz(w, h, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    payload = encode_bmp24(pix)
    # real container invariants: magic, 54-byte header, padded stride
    stride = (w * 3 + 3) & ~3
    assert payload[:2] == b"BM" and len(payload) == 54 + stride * h
    out = decode_bmp24_gray(payload)
    assert out.shape == (h, w)
    np.testing.assert_array_equal(out, pix)


def test_bmp_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp24_gray(b"PNG\x00" + b"\x00" * 64)
    with pytest.raises(ValueError):
        # valid magic, unsupported depth
        pix = np.zeros((2, 2), np.uint8)
        payload = bytearray(encode_bmp24(pix))
        payload[28] = 8  # claim 8bpp
        decode_bmp24_gray(bytes(payload))
