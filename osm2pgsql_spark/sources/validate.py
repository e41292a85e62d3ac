"""Input sanity checks — the reference's ordering/validity pass.

Reference: /root/reference/src/input.cpp:24-60 — ids must be positive
and strictly ascending within each entity type, entity phases ordered
nodes -> ways -> relations (negative ids reserved, duplicates
rejected with a hint about --append).

Spark-first: ordering-by-arrival does not exist in a DataFrame (and
the engine does not need it — joins replace sequential passes), so
the meaningful invariants become set properties checked in one
aggregate pass per table: positive ids, no duplicates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ValidationReport:
    n_rows: int
    n_nonpositive_ids: int
    n_duplicate_ids: int

    @property
    def ok(self) -> bool:
        return self.n_nonpositive_ids == 0 and self.n_duplicate_ids == 0


def validate_ids(df: DataFrame, id_col: str = "id") -> ValidationReport:
    """One aggregation pass: row count, non-positive ids, duplicates."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col(id_col) <= 0, 1).otherwise(0)).alias("bad"),
        (F.count(F.lit(1)) - F.countDistinct(id_col)).alias("dups"),
    ).collect()[0]
    return ValidationReport(
        n_rows=agg["n"] or 0,
        n_nonpositive_ids=agg["bad"] or 0,
        n_duplicate_ids=agg["dups"] or 0,
    )


def check_input(nodes: DataFrame, ways: DataFrame, relations: DataFrame) -> dict[str, ValidationReport]:
    """Validate the whole trio; raises on violation like the
    reference's hard error (src/input.cpp:35-55)."""
    out = {
        "nodes": validate_ids(nodes),
        "ways": validate_ids(ways),
        "relations": validate_ids(relations),
    }
    problems = [k for k, v in out.items() if not v.ok]
    if problems:
        details = {k: vars(out[k]) for k in problems}
        raise ValueError(f"input validation failed: {details}")
    return out
