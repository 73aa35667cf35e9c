"""Reusable column-expression builders (JVM-side, codegen-friendly).

No Python UDFs here — everything is composed from pyspark.sql.functions
higher-order functions so Catalyst sees through it (pushdown, pruning,
whole-stage codegen).
"""

from .text import normalize_text, tokens, word_shingles  # noqa: F401
from .vectors import cosine_similarity, dot, l2_norm, to_double_array  # noqa: F401
