"""PII detection / redaction (training-data pipeline surface, SURVEY §2.3).

Standard pre-training hygiene: find and mask emails, phone-like numbers,
US SSNs, and IPv4 addresses in document text. Everything is built-in
``regexp_count`` / ``regexp_replace`` column expressions — JVM-side,
codegen'd, map-only (no shuffle, no UDF): the canonical 100 TB shape, a
single scan that rewrites a string column.

Patterns are deliberately written in the RE2-compatible subset shared by
Spark (Java regex) and DuckDB so the driver oracle can replicate them
verbatim. They are detectors, not validators — standard for corpus
redaction, where recall beats precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: SSN before phone (an SSN is phone-shaped), email before
# anything that could eat its local part
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}", "[PHONE]"),
]


def pii_counts(text_col: str | Column) -> list[Column]:
    """One ``n_<kind>`` count column per PII pattern."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return [
        F.regexp_count(col, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]


def redact_pii(text_col: str | Column) -> Column:
    """All PII patterns masked with their placeholder tokens, in declared
    order (SSN masked before the phone pattern can match inside it)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for _, pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col
