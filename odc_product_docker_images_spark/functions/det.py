"""Determinism helpers for oracle parity (SURVEY.md §5.4, §7 hard-part 2).

Floating-point SUM/AVG is summation-order-dependent; Spark's partial
aggregation order differs run-to-run and from DuckDB's.  The driver compares
an order-insensitive VALUE HASH, so float aggregates must be bit-identical
on both sides.  Policy:

- **Sums/averages**: cast each addend to DECIMAL(30,10) (a double rounds to
  10 dp identically in both engines), sum exactly (decimal addition is
  associative), cast the total back to double, round(6).  Deterministic
  regardless of partition order or group count.
- **Per-row arithmetic** (+,-,*,/, sqrt): IEEE-exact, identical across
  engines — no rounding needed.
- **libm functions** (pow/log/exp) and multi-pass stats (stddev, regr_*):
  last-ulp may differ between JVM and C++ — round to a coarse grid (4-6 dp)
  and keep group counts small so boundary collisions stay improbable.

Each Spark helper has a ``sql_*`` twin that emits the equivalent DuckDB SQL
fragment, so both sides are generated from one convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"
SQL_DEC = "DECIMAL(30,10)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str, nd: int = 6) -> Column:
    """Order-insensitive exact sum of a double expression → double, round(nd)."""
    return F.round(F.sum(_c(col).cast(DEC)).cast("double"), nd).alias(alias)


def davg(col: Column | str, alias: str, nd: int = 6) -> Column:
    """Deterministic average: exact decimal sum / non-null count → double."""
    c = _c(col)
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), nd).alias(alias)


def sql_dsum(expr: str, alias: str, nd: int = 6) -> str:
    return f"ROUND(CAST(SUM(CAST(({expr}) AS {SQL_DEC})) AS DOUBLE), {nd}) AS {alias}"


def sql_davg(expr: str, alias: str, nd: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS {SQL_DEC})) AS DOUBLE)"
        f" / COUNT({expr}), {nd}) AS {alias}"
    )
