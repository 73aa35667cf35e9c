"""PII detection and redaction over document text.

A large-scale training-data pipeline must scrub personally identifiable
information before corpus assembly. This module finds and masks the
regex-detectable classes — emails, North-American phone numbers, IPv4
addresses, SSN-shaped ids — entirely with JVM-side ``regexp_replace`` /
``regexp_count`` (no Python in the hot path; the scan is a single
projection, embarrassingly parallel, no shuffle).

The patterns are deliberately restricted to syntax shared by Java regex
(Spark) and RE2 (DuckDB/Go): no backreferences, no lookaround — so the
exact same pattern string runs on both engines and the DuckDB oracle is
strict. Extending to checksum-validated ids (credit cards / IBANs) or
NER-based person names would move to a Pandas UDF; the column contract
stays the same.

Scale: pure narrow transformation — pushdown-friendly, codegen'd,
streams through 100 TB at scan speed. Counting before replacing costs
one extra regex pass per class; fuse into one pass with
``regexp_extract_all`` + size if the count columns are not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared Java-regex/RE2 subset (keep in sync with PII_PATTERNS_SQL users).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"

# Order matters: SSN/phone before IPv4 is irrelevant (disjoint shapes),
# but phone must run before a hypothetical bare-digit pattern. Masks are
# distinct so audits can distinguish classes post-hoc.
PII_CLASSES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IP>"),
]


def redact_text(col: Column) -> Column:
    """The masked text expression: every PII class replaced in sequence."""
    out = col
    for _, pattern, mask in PII_CLASSES:
        out = F.regexp_replace(out, pattern, mask)
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", keep_original: bool = False
) -> DataFrame:
    """Append per-class match counts and the redacted text.

    Columns added: ``n_email / n_ssn / n_phone / n_ipv4`` (long),
    ``n_pii`` (total), ``redacted`` (masked text). The original text
    column is dropped unless ``keep_original`` — at scale, never carry
    both copies of a 100 TB column through the rest of the plan.
    """
    c = F.col(text_col)
    counts = {
        f"n_{name}": F.regexp_count(c, F.lit(pattern)).cast("long")
        for name, pattern, _ in PII_CLASSES
    }
    out = df.withColumns(
        {
            **counts,
            "n_pii": sum(counts.values(), F.lit(0)).cast("long"),
            "redacted": redact_text(c),
        }
    )
    if not keep_original:
        out = out.drop(text_col)
    return out


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple: every
    equivalence class (distinct combination of ``quasi_cols``) with its
    size and a violation flag (size < k means those rows are
    re-identifiable by linking on the quasi identifiers — the standard
    release gate before a dataset leaves the curated zone).

    Scale shape: one map-side-combinable grouped count keyed on the
    quasi tuple — the same economics as any grouped agg; the output is
    one row per equivalence class, tiny relative to the input. Rows in
    violating classes are the candidates for suppression or
    generalization (coarsening a quasi column until every class
    reaches k)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("class_size"))
        .withColumn("is_violation", F.col("class_size") < k)
    )


def suppression_summary(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row summary of the k-anonymity audit: number of equivalence
    classes, violating classes, and the fraction of ROWS that would
    need suppression to reach k-anonymity (the metric release reviews
    actually quote)."""
    classes = k_anonymity(df, quasi_cols, k)
    return classes.agg(
        F.count("*").alias("n_classes"),
        F.sum(F.col("is_violation").cast("long")).alias("n_violating"),
        F.round(
            F.sum(F.when(F.col("is_violation"), F.col("class_size")).otherwise(F.lit(0)))
            / F.sum("class_size"),
            6,
        ).alias("suppression_rate"),
    )
