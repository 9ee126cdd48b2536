"""End-to-end corpus curation — the composition a training-data pipeline
actually runs before mixing/packing: quality filter → language filter →
exact dedup → benchmark decontamination. This module only WIRES the
pipeline's tested primitives, so the composed plan inherits their scale
shapes: the quality and language stages are scan-side codegen filters
(they push into the parquet scan), dedup shuffles 16-byte digests, and
decontamination is a broadcast semi-join — the corpus text crosses no
shuffle anywhere in the funnel.

Reference parity: the reference validates a fixed shape suite; curation is
an engine-original addition mandated by the graft brief (training-data
pipeline ops), composed so each stage stays individually oracle-able.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from shaclapi_spark.pipeline.dedup import decontaminate, exact_dedup
from shaclapi_spark.pipeline.text import quality_columns

STAGES = ("raw", "quality", "lang", "dedup", "decontam")


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    keep_langs: tuple[str, ...] = ("en", "de"),
    min_tokens: int = 10,
    max_token_len: int = 30,
    n: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Run the curation funnel; returns ``(curated, funnel)``.

    ``curated`` is the surviving relation (original columns); ``funnel`` is
    (stage_idx, stage, n_docs) — the row count after each stage, the
    monitoring relation every production curation job materializes. The
    funnel is a union of count aggregates over shared sub-plans: one
    action computes all five counts."""
    qc = quality_columns(F.col(text_col))
    s_quality = docs.filter(
        (qc["n_tokens"] >= F.lit(min_tokens))
        & (qc["max_token_len"] <= F.lit(max_token_len))
    )
    s_lang = s_quality.filter(F.col(lang_col).isin(*keep_langs))
    survivors = exact_dedup(s_lang, id_col, text_col)
    s_dedup = s_lang.join(survivors, id_col, "left_semi")
    s_decontam = decontaminate(s_dedup, benchmark, id_col, text_col, n=n)
    stages = [docs, s_quality, s_lang, s_dedup, s_decontam]
    counts = [
        s.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col("n_docs"),
        )
        for i, (name, s) in enumerate(zip(STAGES, stages))
    ]
    funnel = reduce(lambda a, b: a.unionByName(b), counts)
    return s_decontam, funnel
