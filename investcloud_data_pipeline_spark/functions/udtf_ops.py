"""Python UDTF surface (Spark 4 table functions).

The reference's UDF surface is a single scalar dict-UDF (SURVEY §2.12);
this completes the trio — scalar (replaced by broadcast join), grouped
pandas kernels (simhash/multimodal), and a table function: one input row
expanding to N output rows with its own schema. The chunker opts into
Spark 4's Arrow-optimized UDTF evaluation (``useArrow=True`` — batched
columnar transfer instead of row-at-a-time pickling), keeping the whole
registry free of BatchEvalPython nodes; even so, high-volume expansion
belongs to JVM-side ``explode`` (see multimodal.sample_frames) or
``mapInPandas``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int", useArrow=True)
class ChunkText:
    """Split a document into fixed-size token chunks with overlap — the
    canonical pre-embedding chunker of an LLM data pipeline."""

    CHUNK = 64
    OVERLAP = 8

    def eval(self, text: str):  # noqa: D102
        toks = (text or "").split()
        if not toks:
            return
        step = self.CHUNK - self.OVERLAP
        idx = 0
        for start in range(0, max(len(toks) - self.OVERLAP, 1), step):
            piece = toks[start : start + self.CHUNK]
            yield idx, " ".join(piece), len(piece)
            idx += 1


class SplitFixed:
    """Polymorphic UDTF: splits a delimited string into N typed columns
    where N and the column names are decided at PLAN time by
    ``analyze()`` from the literal arguments — the Spark 4 dynamic-schema
    table function (no hard-coded returnType). Used for ingesting
    ragged delimited payloads whose width is a per-call contract."""

    @staticmethod
    def analyze(row_arg, n_arg, *_):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import StringType, StructType

        n = int(n_arg.value)
        schema = StructType()
        for i in range(n):
            schema = schema.add(f"part_{i}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, value: str, n: int, sep: str = ","):  # noqa: D102
        if value is None:
            yield (None,) * n
            return
        parts = value.split(sep)
        parts = (parts + [None] * n)[:n]
        yield tuple(parts)


def split_fixed_columns(
    df: DataFrame, col: str, n: int, sep: str = ","
) -> DataFrame:
    """Expand a delimited string column to ``n`` typed columns via the
    polymorphic UDTF (schema resolved at analysis from the literal n)."""
    from pyspark.sql.functions import udtf

    spark = df.sparkSession
    spark.udtf.register("split_fixed", udtf(SplitFixed))
    df.createOrReplaceTempView("__split_src")
    cols = ", ".join(f"s.part_{i}" for i in range(n))
    return spark.sql(
        f"""
        SELECT d.*, {cols}
        FROM __split_src d,
        LATERAL split_fixed(d.{col}, {n}, '{sep}') s
        """
    )


def chunk_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Apply the chunker UDTF per document via a lateral join."""
    df.createOrReplaceTempView("__docs_to_chunk")
    spark = df.sparkSession
    spark.udtf.register("chunk_text", ChunkText)
    return spark.sql(
        f"""
        SELECT d.{id_col}, c.chunk_idx, c.chunk, c.n_tokens
        FROM __docs_to_chunk d,
        LATERAL chunk_text(d.{text_col}) c
        """
    )
