"""Training-output sharding: deterministic shard assignment, a per-shard
manifest (row count, payload bytes, order-insensitive content
fingerprint), and the partitioned writer a training job consumes.

The reference ends at verdict/violation sinks (shaclapi/api.py writes
validation output; SURVEY §2.1 S4); a training-data engine additionally
has to MATERIALIZE the curated corpus as N reproducible shards with a
manifest the downstream loader can integrity-check. Engine-original op
(graft brief), built on the repo's exact-integer hashing conventions
(sampling.md5_60) so the manifest is value-hash oracled cross-engine.

Scale shape (100 TB):
* shard assignment is a scan-side projection (md5 of the id — no data
  movement, no RNG state; re-running on any engine reproduces it);
* the manifest is ONE map-combinable groupBy over n_shards keys — the
  fingerprint is bit_xor over per-row 60-bit digests, so partial
  aggregation combines associatively and the shuffle carries n_shards
  rows per task, never payloads;
* the writer repartitions BY THE SHARD COLUMN before partitionBy — one
  task owns one shard directory, so an N-task stage emits N files, not
  N×n_shards small files (the classic partitionBy fan-out trap);
* resumability: the manifest is derived from data content only — after
  an interrupted write, recompute and diff per-shard fingerprints to
  find shards needing rewrite (same idempotence discipline as
  lineage.run_with_lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from shaclapi_spark.pipeline.sampling import md5_60


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    shard_col: str = "shard",
) -> DataFrame:
    """Add a deterministic shard column: md5_60(salt || id) % n_shards.

    Hash-mod (not round-robin / monotonically_increasing_id) so the
    assignment is a pure row property — stable under repartitioning,
    retries, and engine changes."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = md5_60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return df.withColumn(shard_col, (h % n_shards).cast("int"))


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard",
) -> DataFrame:
    """Per-shard manifest: (shard, n_docs, n_bytes, content_fp).

    ``n_bytes`` sums the payload's UTF-8 byte length (octet_length);
    ``content_fp`` is bit_xor over md5_60(id || ':' || payload) — order-
    insensitive and associative, so it combines map-side and is invariant
    to row order within the shard. Two shards with equal (n_docs,
    content_fp) hold the same row multiset with overwhelming probability;
    the loader checks both before trusting a resumed shard. NULL payloads
    count 0 bytes and hash the id alone (still present in n_docs).
    """
    with_shard = assign_shards(df, n_shards, id_col, salt)
    row_fp = md5_60(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit(":"),
            F.coalesce(F.col(text_col).cast("string"), F.lit("")),
        )
    )
    return (
        with_shard.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.octet_length(F.col(text_col))), F.lit(0)
            ).alias("n_bytes"),
            F.bit_xor(row_fp).alias("content_fp"),
        )
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard",
) -> DataFrame:
    """Write the corpus as ``path/shard=K/`` parquet plus a manifest at
    ``path/_manifest`` (parquet); returns the manifest DataFrame.

    repartition(shard) BEFORE partitionBy: each write task owns whole
    shards, so file count stays O(n_shards) instead of
    O(tasks × n_shards) — the small-files failure mode at scale.
    """
    with_shard = assign_shards(df, n_shards, id_col, salt)
    with_shard.repartition(n_shards, F.col("shard")).write.partitionBy(
        "shard"
    ).mode("overwrite").parquet(path)
    manifest = shard_manifest(df, n_shards, id_col, text_col, salt)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest


def verify_shards(
    spark_df: DataFrame,
    manifest: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard",
) -> DataFrame:
    """Integrity check a (re-read) shard set against a stored manifest:
    returns per-shard (shard, ok, n_docs_expected, n_docs_actual) rows
    where ``ok`` requires both count and fingerprint equality. Full outer
    join so missing or extraneous shards surface as ok=false rows."""
    actual = shard_manifest(spark_df, n_shards, id_col, text_col, salt)
    e = manifest.select(
        "shard",
        F.col("n_docs").alias("n_docs_expected"),
        F.col("content_fp").alias("fp_expected"),
    )
    a = actual.select(
        "shard",
        F.col("n_docs").alias("n_docs_actual"),
        F.col("content_fp").alias("fp_actual"),
    )
    j = e.join(a, "shard", "full_outer")
    ok = (
        F.col("n_docs_expected").isNotNull()
        & F.col("n_docs_actual").isNotNull()
        & (F.col("n_docs_expected") == F.col("n_docs_actual"))
        & (F.col("fp_expected") == F.col("fp_actual"))
    )
    return j.select(
        "shard", ok.alias("ok"), "n_docs_expected", "n_docs_actual"
    )
