"""PII scrubbing + in-document line dedup — pure whole-stage-codegen
column expressions (no UDFs, no shuffles): the redaction pass a
training-data pipeline runs before anything leaves the raw zone.

Patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB, Go scanners) so the exact same relation is
reproducible across engines — no lookbehind, no backreferences.

Replacement order matters: card numbers are redacted BEFORE phone
numbers (a 16-digit grouped card number also matches the looser phone
pattern), and emails before anything that could eat their digits.

Reference parity: the reference has no scrubbing; this is an
engine-original addition mandated by the graft brief (training-data
pipeline ops), same category as `pipeline/dedup.py`.

Scale shape (100 TB): every function here is a row-local projection —
it fuses into whichever scan feeds it, shuffles nothing, and pushes no
work to Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: pattern registry, applied in this order (see module docstring)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b", "<CARD>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Text with every registered PII pattern replaced by its tag."""
    out = text
    for _name, pattern, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (n_email, n_card, n_ipv4, n_phone).

    Counts are taken on the SAME progressively-redacted text the
    replacement pass sees, so overlapping patterns are attributed to
    exactly one kind (a card number counts as a card, not also a phone)
    and the counts always reconcile with `redact_pii`'s output.
    """
    counts: dict[str, Column] = {}
    out = text
    for name, pattern, tag in PII_PATTERNS:
        counts[f"n_{name}"] = F.size(F.regexp_extract_all(out, F.lit(pattern), 0))
        out = F.regexp_replace(out, pattern, tag)
    return counts


def scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``<text_col>_redacted`` plus per-kind PII counts."""
    out = df.withColumn(f"{text_col}_redacted", redact_pii(F.col(text_col)))
    for name, col in pii_counts(F.col(text_col)).items():
        out = out.withColumn(name, col)
    return out


def dedup_lines(text: Column, sep: str = "\n") -> Column:
    """Text with repeated lines removed, FIRST occurrence kept in place —
    the in-document half of line-level dedup (the cross-document half is
    `pipeline/dedup.py`). Row-local: the quadratic first-occurrence probe
    runs over one document's own line array (documents have bounded line
    counts; the corpus does not)."""
    lines = F.split(text, sep)
    kept = F.filter(
        lines, lambda x, i: F.array_position(lines, x) == i + F.lit(1)
    )
    return F.array_join(kept, sep)


def with_line_dedup(
    df: DataFrame, text_col: str = "text", sep: str = "\n"
) -> DataFrame:
    """Adds ``<text_col>_deduped`` and ``n_dup_lines`` (lines removed)."""
    lines = F.split(F.col(text_col), sep)
    deduped = dedup_lines(F.col(text_col), sep)
    return df.withColumn(f"{text_col}_deduped", deduped).withColumn(
        "n_dup_lines",
        (F.size(lines) - F.size(F.split(deduped, sep))).cast("long"),
    )
