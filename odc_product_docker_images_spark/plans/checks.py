"""Physical-plan assertions (SURVEY.md §4).

The reference's optimizations (Postgres predicate pushdown, band selection,
extent-index pruning) correspond to properties VISIBLE in Spark's physical
plan.  These helpers make them testable invariants instead of hopes:
a scan that stops pushing filters, a dim join that stops broadcasting, or
a kernel that silently falls back to row-at-a-time Python shows up as a
test failure — plan regressions are perf regressions at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters line(s) of every parquet scan in the plan."""
    return "\n".join(re.findall(r"PushedFilters: \[[^\]]*\]", formatted_plan(df)))


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of columns actually read from parquet (ReadSchema lines)."""
    cols: set[str] = set()
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols |= {part.split(":")[0].strip() for part in m.split(",") if part.strip()}
    return cols


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    pf = pushed_filters(df)
    assert column in pf, f"no pushed filter on {column!r}; got: {pf or '<none>'}"


def assert_columns_pruned(df: DataFrame, expected: set[str]) -> None:
    got = read_schema_columns(df)
    assert got == expected, f"scan reads {sorted(got)}, want {sorted(expected)}"


def assert_broadcast_join(df: DataFrame) -> None:
    assert "BroadcastHashJoin" in formatted_plan(df), "expected a broadcast hash join"


def assert_no_python_row_path(df: DataFrame) -> None:
    """Arrow-batched pandas ops are fine; row-at-a-time Python is not."""
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in the plan"


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast HINTS in the optimized logical plan.

    Distinguishes a broadcast the query DEMANDS (``F.broadcast(...)`` — the
    driver must collect that side no matter how big it turns out) from one
    the optimizer merely PICKS off its size estimate (safe: estimate-gated
    by autoBroadcastJoinThreshold, revisited by AQE at runtime)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    return plan.count("strategy=broadcast")


def exchange_count(df: DataFrame) -> int:
    return formatted_plan(df).count("Exchange ")


def scan_count(df: DataFrame) -> int:
    """Number of DISTINCT parquet scans (formatted plans print each node
    twice: once in the tree, once in the details section)."""
    return len(set(re.findall(r"\((\d+)\) Scan parquet", formatted_plan(df))))


def codegen_stage_count(df: DataFrame) -> int:
    ids = re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))
    return len(set(ids))
