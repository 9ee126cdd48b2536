"""Web-scrape cleaning signals: encoding-artifact (mojibake) detection and
URL / domain statistics — pure whole-stage-codegen column expressions.

Training corpora scraped from the web carry two classes of junk the
quality scorer (pipeline/text.py) doesn't look for: double-encoded UTF-8
("Ã©", "â€™"), replacement characters and stray control bytes from broken
decoders; and boilerplate/link-farm pages detectable from their URL mix.
Both belong in the curation funnel next to quality/lang-ID.

Patterns live in the Java-regex ∩ RE2 common subset (same policy as
pipeline/scrub.py) so the DuckDB oracle reproduces every count exactly.

Reference parity: none — engine-original addition mandated by the graft
brief (training-data pipeline ops), same category as pipeline/scrub.py.

Scale shape (100 TB): artifact scoring is a row-local projection (fuses
into the scan, shuffles nothing). Domain stats shuffle only (domain,
count) pairs after a map-side combine — never text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: encoding-artifact registry: (name, regex) — counts per pattern.
#: mojibake = UTF-8 bytes decoded as Latin-1/cp1252: 'Ã'+continuation or
#: the 'â€¦' punctuation family; repl = U+FFFD; ctrl = C0 bytes that no
#: sane text contains (tab/newline/CR excluded).
ARTIFACT_PATTERNS: tuple[tuple[str, str], ...] = (
    ("mojibake", "(Ã[©¨ª«¤¶¼])|(â€[™œ¦])"),
    ("repl", "�"),
    ("ctrl", "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"),
)


def artifact_counts(text: Column) -> dict[str, Column]:
    """Per-class artifact match counts (n_mojibake, n_repl, n_ctrl)."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat in ARTIFACT_PATTERNS
    }


def with_encoding_quality(
    df: DataFrame, text_col: str = "text", max_per_kchar: int = 2
) -> DataFrame:
    """Adds artifact counts plus ``enc_ok``: total artifacts per 1000
    chars must stay under ``max_per_kchar`` (integer math — exact)."""
    counts = artifact_counts(F.col(text_col))
    out = df
    for name, col in counts.items():
        out = out.withColumn(name, col.cast("long"))
    total = sum(F.col(f"n_{name}") for name, _ in ARTIFACT_PATTERNS)
    return out.withColumn(
        "enc_ok",
        total * 1000 < F.length(F.col(text_col)).cast("long") * max_per_kchar,
    )


#: scheme://host — host capture group 1; path chars stop at whitespace
URL_PATTERN = "https?://[A-Za-z0-9._~:/?#@!$&'*+,;=%()\\[\\]-]+"
HOST_PATTERN = "^https?://([^/?#]+)"


def extract_urls(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per (doc, url) occurrence: (id, url, domain)."""
    urls = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
        ).alias("url"),
    )
    return urls.withColumn(
        "domain", F.regexp_extract(F.col("url"), HOST_PATTERN, 1)
    )


def domain_stats(
    df: DataFrame,
    blocklist: tuple[str, ...] = (),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain corpus statistics: total URL occurrences, distinct docs
    linking it, and a blocklist flag.

    The groupBy shuffles (domain, id) pairs — text never leaves the scan
    stage; a map-side partial aggregate handles head domains, and the
    blocklist is a literal IN (no join, no broadcast needed).
    """
    urls = extract_urls(df, id_col=id_col, text_col=text_col)
    return urls.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct(id_col).alias("n_docs"),
        F.max(F.col("domain").isin(*blocklist) if blocklist else F.lit(False)).alias(
            "blocked"
        ),
    )


def blocked_docs(
    df: DataFrame,
    blocklist: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct doc ids that link any blocklisted domain (drop list)."""
    urls = extract_urls(df, id_col=id_col, text_col=text_col)
    return urls.filter(F.col("domain").isin(*blocklist)).select(id_col).distinct()
