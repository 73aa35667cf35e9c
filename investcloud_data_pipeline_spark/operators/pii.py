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
