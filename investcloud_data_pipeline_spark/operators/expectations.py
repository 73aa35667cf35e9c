"""Declarative data-quality expectations (dbt-test / Deequ shape).

The reference hard-codes one validity predicate (quality.py::split_quality,
reference 01:40-52). Real lakehouse tables carry a CHECK SUITE: the
operators here compile a list of declarative expectations into ONE
aggregation pass over the table (every column check becomes a
conditional-count expression in the same agg) plus one anti-join per
referential check — violations are counted, not materialized, so the
report is |checks| rows no matter the table size.

Scale: the single-pass design matters — N column checks cost one scan,
not N; the relationship check broadcasts the (distinct) referenced keys
when small. To materialize offending ROWS instead of counts, reuse each
expectation's predicate as a filter — same expressions, no second
framework.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named check: ``violation`` is a boolean column expression
    that is true for each offending row."""

    name: str
    violation: Column


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null:{col}", F.col(col).isNull())


def accepted_values(col: str, values: list) -> Expectation:
    return Expectation(
        f"accepted_values:{col}", ~F.col(col).isin(values) | F.col(col).isNull()
    )


def in_range(
    col: str, lo: float | None = None, hi: float | None = None
) -> Expectation:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return Expectation(f"in_range:{col}", cond)


def matches(col: str, pattern: str) -> Expectation:
    """Java-regex/RE2 shared subset, same portability contract as pii.py."""
    return Expectation(
        f"matches:{col}",
        F.col(col).isNull() | ~F.regexp_like(F.col(col), F.lit(pattern)),
    )


@dataclass(frozen=True)
class UniqueExpectation:
    """unique: counted as rows beyond the first per key (needs a
    grouped pass, not a row predicate)."""

    cols: tuple
    name: str = field(default="")

    def __post_init__(self):
        object.__setattr__(
            self, "name", f"unique:{','.join(self.cols)}"
        )


def unique(*cols: str) -> UniqueExpectation:
    return UniqueExpectation(tuple(cols))


@dataclass(frozen=True)
class ReferencesExpectation:
    """referential integrity: fk values (non-null) must exist in the
    referenced frame's key column."""

    fk: str
    ref: DataFrame
    ref_col: str
    name: str = field(default="")

    def __post_init__(self):
        object.__setattr__(self, "name", f"references:{self.fk}->{self.ref_col}")


def references(fk: str, ref: DataFrame, ref_col: str) -> ReferencesExpectation:
    return ReferencesExpectation(fk, ref, ref_col)


def validate(df: DataFrame, checks: list) -> DataFrame:
    """Run the suite → (check, n_violations, passed), one row per check.

    Column checks fuse into a single aggregation; unique checks add one
    grouped pass each; references add one anti-join count each.
    """
    row_checks = [c for c in checks if isinstance(c, Expectation)]
    parts: list[DataFrame] = []

    if row_checks:
        aggs = [
            F.sum(F.when(c.violation, 1).otherwise(0)).cast("long").alias(c.name)
            for c in row_checks
        ]
        wide = df.agg(*aggs)
        stack_expr = ", ".join(
            f"'{c.name}', `{c.name}`" for c in row_checks
        )
        parts.append(
            wide.selectExpr(
                f"stack({len(row_checks)}, {stack_expr}) AS (check, n_violations)"
            )
        )

    for c in checks:
        if isinstance(c, UniqueExpectation):
            dup = (
                df.groupBy(*c.cols)
                .agg(F.count("*").alias("n"))
                .agg(
                    F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
                .select(F.lit(c.name).alias("check"), "n_violations")
            )
            parts.append(dup)
        elif isinstance(c, ReferencesExpectation):
            ref_keys = c.ref.select(
                F.col(c.ref_col).alias("__ref_key")
            ).distinct()
            orphans = (
                df.filter(F.col(c.fk).isNotNull())
                .join(
                    F.broadcast(ref_keys),
                    F.col(c.fk) == F.col("__ref_key"),
                    "left_anti",
                )
                .agg(F.count("*").cast("long").alias("n_violations"))
                .select(F.lit(c.name).alias("check"), "n_violations")
            )
            parts.append(orphans)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
