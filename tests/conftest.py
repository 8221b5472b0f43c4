from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_binlog_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("MBS_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mbs-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def assert_frames_match(spark_df, duck_df, name: str = "") -> None:
    """Driver-gate replica: row count + column names + order-insensitive
    value equality (stringified, NaN-normalized)."""
    import pandas as pd

    a = spark_df.toPandas()
    b = duck_df
    assert sorted(a.columns) == sorted(b.columns), (
        f"{name}: columns {sorted(a.columns)} != {sorted(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    cols = sorted(a.columns)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        for c in cols:
            out[c] = out[c].map(lambda v: "␀" if v is None or v != v else str(v))
        return out.sort_values(cols, kind="mergesort").reset_index(drop=True)

    na, nb = norm(a), norm(b)
    if not na.equals(nb):
        diff = (na != nb).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch\nspark:\n{na[diff].head()}\n"
            f"oracle:\n{nb[diff].head()}"
        )
