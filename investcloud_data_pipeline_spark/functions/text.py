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


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram strings from an already-materialized token
    array column; docs shorter than n tokens yield a single shingle of
    all their tokens, so no doc is silently dropped from shingle-based
    dedup.

    The argument must be a plain attribute (a column of a relation, not
    an expression tree): every `slice` below references the token array
    once per shingle, and if `toks` were an unevaluated expression the
    interpreted higher-order functions would re-run it per shingle —
    measured ~5× on the full shingle pipeline. Producers should
    materialize the token array behind a shuffle (see
    ``operators/dedup_fuzzy.tokenized``) before calling this.
    """
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


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram strings straight from a text column.

    Convenience form for small inputs/tests: the token subtree is
    re-evaluated per shingle by the interpreted higher-order functions,
    so hot paths should tokenize behind a barrier and use
    ``shingles_from_tokens`` instead."""
    return shingles_from_tokens(tokens(col), n)
