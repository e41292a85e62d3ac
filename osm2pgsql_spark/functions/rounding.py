"""Cross-engine deterministic rounding.

Engines differ in round() tie-breaking (HALF_UP vs HALF_EVEN vs
banker's), which breaks value-hash comparison of otherwise-identical
results.  floor(x * s + 0.5) / s is pure IEEE double arithmetic and
evaluates identically in Spark and DuckDB, so every surfaced float in
this engine's query outputs goes through these helpers, and oracle
SQL uses the *_sql twins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def roundn(col: Column, digits: int) -> Column:
    s = float(10**digits)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def roundn_sql(expr: str, digits: int) -> str:
    s = float(10**digits)
    return f"floor(({expr}) * {s} + 0.5) / {s}"


def round2(col: Column) -> Column:
    return roundn(col, 2)


def round4(col: Column) -> Column:
    return roundn(col, 4)


def round6(col: Column) -> Column:
    return roundn(col, 6)
