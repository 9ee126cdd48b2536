"""Token-window document chunking: split long documents into fixed-size
overlapping chunks — the preprocessing step between curation and sequence
packing when documents exceed the model context (pack whole SHORT docs with
``sampling.pack_sequences``; SPLIT long ones here first).

Reference parity: engine-original (graft brief: training-data pipeline
ops); the reference validates graphs and has no text operators.

Chunk grammar (identical integer arithmetic on the DuckDB oracle side):
tokens = whitespace-split of the normalized text; chunk ``i`` covers
tokens ``[i*stride, i*stride + chunk_tokens)``;
``n_chunks = 1 + ceil(max(n_tokens - chunk_tokens, 0) / stride)`` — the
last chunk always reaches the end of the doc, trailing sub-stride
fragments are never emitted as extra chunks, and every token is covered
(stride <= chunk_tokens enforced). Empty docs produce no chunks.

Scale shape: pure per-row codegen — split, sequence, transform(slice),
posexplode. No shuffle, no UDF; the chunk text is materialized INSIDE the
per-row transform so the exploded rows carry only their own chunk, never
the parent token array. Row count grows ~n_tokens/stride per doc, which is
the job's output, not overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from shaclapi_spark.pipeline.text import normalize_text


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks:
    (id, chunk_idx, n_tokens, chunk_text). ``stride < chunk_tokens``
    gives ``chunk_tokens - stride`` tokens of overlap between adjacent
    chunks (standard LM-pretraining context carry-over)."""
    if not (0 < stride <= chunk_tokens):
        raise ValueError(
            f"need 0 < stride <= chunk_tokens, got {stride} > {chunk_tokens}"
        )
    c, s = chunk_tokens, stride
    base = docs.select(
        F.col(id_col),
        F.filter(
            F.split(normalize_text(F.col(text_col)), " "), lambda x: x != ""
        ).alias("__words"),
    ).where(F.size("__words") > 0)
    words = F.col("__words")
    n = F.size(words)
    # ceil((n - c) / s) in exact integer form; floor of a double division
    # is exact to 2^52 tokens — far past any document
    extra = F.greatest(n - F.lit(c), F.lit(0))
    n_chunks = (F.lit(1) + F.floor((extra + F.lit(s - 1)) / F.lit(s))).cast(
        "int"
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            F.least(F.lit(c), n - i * s).cast("int").alias("n_tokens"),
            F.concat_ws(" ", F.slice(words, i * s + 1, c)).alias(
                "chunk_text"
            ),
        ),
    )
    return (
        base.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__c"))
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("__c.n_tokens").alias("n_tokens"),
            F.col("__c.chunk_text").alias("chunk_text"),
        )
    )
