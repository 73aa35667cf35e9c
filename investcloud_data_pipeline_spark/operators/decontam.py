"""Benchmark decontamination: flag corpus documents whose n-gram overlap
with an evaluation set exceeds a threshold.

The standard training-data hygiene step (GPT-3 appendix C / PaLM /
Llama reports): before training, any document sharing enough contiguous
n-grams with a benchmark is dropped or scrubbed so eval numbers measure
generalization, not memorization.

Plan shape: shingle both sides (same tokenizer as the dedup family),
distinct (doc, shingle), equi-join on the shingle, count distinct
overlapping shingles per corpus document, compare to the document's own
shingle count. Scale: the eval side is benchmark-sized (thousands of
documents) → its distinct shingle set broadcasts; the corpus side
streams through one explode + one map-side-combined groupBy on doc_id.
No O(corpus × eval) pair blowup — the join fans out only on actual
shingle matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_from_tokens, tokens


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # Materialize the token array behind a shuffle before shingling —
    # interpreted higher-order functions re-run unevaluated expression
    # arguments per shingle (see shingles_from_tokens docstring).
    toked = df.select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("toks")
    ).repartition(F.col("doc"))
    return (
        toked.select(
            "doc",
            F.explode(shingles_from_tokens(F.col("toks"), n)).alias("shingle"),
        )
        .distinct()
    )


def ngram_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 5,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per corpus document: its distinct n-gram count, how many of those
    n-grams appear anywhere in ``eval_set``, the overlap fraction, and a
    ``contaminated`` flag (overlap_frac >= threshold)."""
    corpus_sh = _doc_shingles(corpus, text_col, id_col, n)
    eval_sh = (
        _doc_shingles(eval_set, text_col, id_col, n)
        .select("shingle")
        .distinct()
    )
    sizes = corpus_sh.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    overlap = (
        corpus_sh.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .groupBy("doc")
        .agg(F.count("*").alias("n_overlap"))
    )
    frac = F.round(
        F.coalesce(F.col("n_overlap"), F.lit(0)) / F.col("n_shingles"), 6
    )
    return (
        sizes.join(overlap, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_shingles",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            frac.alias("overlap_frac"),
            (frac >= F.lit(threshold)).alias("contaminated"),
        )
    )
