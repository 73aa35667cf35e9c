"""Text normalization / tokenization / shingling as column expressions.

Conventions chosen for engine portability (the DuckDB oracles use the
literally identical regex + join semantics):

* normalize: lowercase, collapse any non-alphanumeric run to one space,
  trim.
* tokens: split normalized text on single spaces (after collapsing,
  every separator is exactly one space).
* word shingles: n consecutive tokens joined by one space.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NORMALIZE_RE = "[^a-z0-9]+"


def normalize_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), NORMALIZE_RE, " "))


def tokens(col: Column | str) -> Column:
    """Token array of the *normalized* text ('' → empty array)."""
    norm = normalize_text(col)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram strings (array<string>); docs shorter than n
    tokens yield a single shingle of all their tokens, so no doc is
    silently dropped from shingle-based dedup."""
    toks = tokens(col)
    joined_all = F.array_join(toks, " ")
    shingle_at = lambda i: F.array_join(F.slice(toks, i, n), " ")  # noqa: E731
    n_shingles = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.when(F.size(toks) <= n, F.array(joined_all)).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_shingles), lambda i: shingle_at(i)
                )
            )
        )
    )
