"""Plan-inspection helpers: assert the physical plan is the one a
100 TB deployment needs (pushdown reached the scan, dims broadcast,
no stray shuffles). Used by tests and by bench sanity checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan.split(
        "PushedFilters: ["
    )[0]


def count_broadcast_joins(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange")


def reads_columns(df: DataFrame, table_hint: str) -> list[str]:
    """Columns actually read from scans (column-pruning check)."""
    import re

    plan = physical_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(part.split(":")[0] for part in m.group(1).split(",") if part)
    return cols
