"""Replica of the driver's correctness gate: every ``queries()`` entry vs
its ``oracle_sql()`` via DuckDB (row count + schema + order-insensitive
values) at the test scale factor (SURVEY.md §5.2.7)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

from conftest import assert_frames_match

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, sf_dir, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    sdf = q(spark, sf_dir)
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only check (driver's weaker gate)
        return
    odf = ddb.execute(oracles[name]).df()
    assert_frames_match(sdf, odf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 6
