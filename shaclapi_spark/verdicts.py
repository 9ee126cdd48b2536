"""Verdict-relation helpers: the core output algebra of the engine.

Verdicts:   (entity_id string, shape string, is_valid boolean, reason string)
Violations: (entity_id, shape, constraint_id, detail)
Summary:    (bucket int, shape, n_valid long, n_invalid long)

The per-(entity, shape) verdict with a `reason` naming the invalidating
constraint/shape mirrors the reference's validation-result tuples
(shaclapi/reduction/ValidationResultTransmitter.py:18-25, reason semantics
pinned by tests/tc4/test_definitions/test1.json — invalid targets carry the
invalidating shape name).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

VERDICT_COLS = ["entity_id", "shape", "is_valid", "reason"]
VIOLATION_COLS = ["entity_id", "shape", "constraint_id", "detail"]


def union_all(dfs: list[DataFrame]) -> DataFrame | None:
    dfs = [d for d in dfs if d is not None]
    if not dfs:
        return None
    return reduce(lambda a, b: a.unionByName(b), dfs)


def summarize(verdicts: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Per-partition (hash-bucket) pass/fail summary — the north rule's
    'per-partition pass/fail summaries'. Bucket = xxhash64(entity_id) % n,
    deterministic and stable across cluster sizes (unlike
    spark_partition_id, which is a scheduling artifact)."""
    bucket = F.pmod(F.xxhash64(F.col("entity_id")), F.lit(n_buckets)).cast("int")
    return (
        verdicts.groupBy(bucket.alias("bucket"), "shape")
        .agg(
            F.sum(F.col("is_valid").cast("long")).alias("n_valid"),
            F.sum((~F.col("is_valid")).cast("long")).alias("n_invalid"),
        )
        .orderBy("bucket", "shape")
    )


def verdict_sets(verdicts: DataFrame, target_shapes: list[str] | None = None):
    """Driver-side golden-test helper: sorted (entity_id, shape) pairs for
    valid/invalid — the reference's order-insensitive compare
    (tests/test_main.py:229-246 analog). Only for small fixtures."""
    df = verdicts
    if target_shapes is not None:
        df = df.filter(F.col("shape").isin(target_shapes))
    rows = df.select("entity_id", "shape", "is_valid").collect()
    valid = sorted((r.entity_id, r.shape) for r in rows if r.is_valid)
    invalid = sorted((r.entity_id, r.shape) for r in rows if not r.is_valid)
    return valid, invalid
