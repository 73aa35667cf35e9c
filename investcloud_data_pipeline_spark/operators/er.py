"""Entity resolution: blocked fuzzy matching on string keys.

The classic record-linkage shape: an all-pairs string-similarity join is
O(n²) and impossible at scale, so candidate generation uses BLOCKING —
records are bucketed by a cheap deterministic key (here: a token of the
name; in production also soundex, prefixes, or multiple redundant
blocking passes) and only within-block pairs are scored. This is the
same shuffle topology as LSH dedup (dedup_fuzzy.py): the blocking key is
the join key, so candidate generation is one equi-join Catalyst executes
as a hash join; the expensive edit-distance predicate runs only on
within-block pairs.

Scale: block sizes bound the quadratic blow-up — monitor the largest
block (a block of b rows yields b² candidates; salting or splitting
oversized blocks caps the skew). ``levenshtein`` is JVM builtin (no
Python). Multiple blocking passes union their candidates before scoring
to recover pairs a single key misses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    max_distance: int = 3,
) -> DataFrame:
    """Within-block candidate pairs with edit distance ≤ ``max_distance``.

    Returns (id1, id2, name1, name2, block, distance) with id1 < id2.
    ``block_expr`` is evaluated against ``df``'s columns.
    """
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        block_expr.alias("block"),
    )
    a = side.alias("a")
    b = side.alias("b")
    return (
        a.join(b, on="block")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn(
            "distance",
            F.levenshtein(F.col("a.name"), F.col("b.name")).cast("long"),
        )
        .filter(F.col("distance") <= max_distance)
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.name").alias("name1"),
            F.col("b.name").alias("name2"),
            "block",
            "distance",
        )
    )


def block_size_profile(df: DataFrame, block_expr: Column) -> DataFrame:
    """Blocking-quality diagnostic: per-block row count and the candidate
    pairs it will generate (b·(b−1)/2). The sum of ``n_pairs`` is the
    exact join cost — inspect BEFORE running the join at scale."""
    return (
        df.groupBy(block_expr.alias("block"))
        .agg(F.count("*").alias("n_rows"))
        .withColumn(
            "n_pairs",
            (F.col("n_rows") * (F.col("n_rows") - F.lit(1)) / F.lit(2)).cast(
                "long"
            ),
        )
    )
