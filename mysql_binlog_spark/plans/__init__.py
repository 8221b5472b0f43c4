"""Physical-plan introspection helpers (the ``.explain`` discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def plan_has(df: DataFrame, *needles: str, mode: str = "formatted") -> bool:
    p = explain_str(df, mode)
    return all(n in p for n in needles)
