"""Portable deterministic hashing (identical in Spark SQL and DuckDB).

Spark's ``hash``/``xxhash64`` have no DuckDB twin, so oracle-checked
sketches (MinHash, LSH bands, hyperplane signs) hash through md5 instead:
``bigint(hex_prefix_12(md5(s)))`` is stable, uniform enough for sketching,
and computable in both engines.  Spark stays JVM-side (conv/substring/md5
are codegen'd builtins) — this costs more than xxhash64 but keeps every
sketch independently verifiable; swap to xxhash64 for pure-production runs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_bigint(col: Column) -> Column:
    """First 48 bits of md5 as a non-negative bigint (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def md5_bigint_sql(expr: str) -> str:
    """DuckDB twin of md5_bigint."""
    return f"('0x' || substr(md5({expr}), 1, 12))::BIGINT"


def seeded(col: Column, seed: int) -> Column:
    return F.concat(col, F.lit(f"#{seed}"))


def seeded_sql(expr: str, seed: int) -> str:
    return f"({expr} || '#{seed}')"


def _seeded_hasher(seed: int):
    # NB: must be a ONE-parameter callable — pyspark passes (element, index)
    # to two-parameter lambdas, which would silently override the seed.
    def f(s: Column) -> Column:
        return md5_bigint(seeded(s, seed))

    return f


def minhash_signature(shingles: Column, k: int = 12) -> list[Column]:
    """k independent min-hashes over a shingle array (all JVM builtins)."""
    return [
        F.array_min(F.transform(shingles, _seeded_hasher(i))).alias(f"mh{i}")
        for i in range(k)
    ]


def minhash_signature_sql(shingles_expr: str, k: int = 12) -> list[str]:
    return [
        (
            f"list_min(list_transform({shingles_expr}, "
            f"s -> {md5_bigint_sql(seeded_sql('s', i))})) AS mh{i}"
        )
        for i in range(k)
    ]


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 random hyperplanes for sign-LSH over embeddings.
    Derived from md5 of (plane, dim) — no RNG, reproducible everywhere;
    shared as literals by the Spark plan and the oracle SQL."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"hp:{p}:{d}".encode()).digest()[0]
            row.append(1.0 if h & 1 else -1.0)
        planes.append(row)
    return planes


def python_md5_bigint(s: str) -> int:
    """Reference twin of md5_bigint for pytest oracles."""
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
