"""Shard assignment, manifest fingerprints, partitioned writer layout,
and integrity verification."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from shaclapi_spark.pipeline import shards


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc body {i}" if i % 7 else None) for i in range(200)],
        "doc_id long, text string",
    )


def test_assignment_deterministic_and_pinned(spark, docs):
    out = shards.assign_shards(docs, 8).collect()
    for r in out:
        assert r["shard"] == _md5_60(f"shard{r['doc_id']}") % 8
    again = {r["doc_id"]: r["shard"] for r in shards.assign_shards(docs, 8).collect()}
    assert all(again[r["doc_id"]] == r["shard"] for r in out)


def test_manifest_counts_and_fp(spark, docs):
    m = {r["shard"]: r for r in shards.shard_manifest(docs, 8).collect()}
    assert sum(r["n_docs"] for r in m.values()) == 200
    # independent recomputation of one shard's fingerprint and bytes
    rows = docs.collect()
    by_shard = {}
    for r in rows:
        s = _md5_60(f"shard{r['doc_id']}") % 8
        fp, nb = by_shard.get(s, (0, 0))
        payload = r["text"] if r["text"] is not None else ""
        fp ^= _md5_60(f"{r['doc_id']}:{payload}")
        nb += len((r["text"] or "").encode())
        by_shard[s] = (fp, nb)
    for s, (fp, nb) in by_shard.items():
        assert m[s]["content_fp"] == fp
        assert m[s]["n_bytes"] == nb


def test_manifest_order_insensitive(spark, docs):
    a = {r["shard"]: r["content_fp"] for r in shards.shard_manifest(docs, 4).collect()}
    shuffled = docs.orderBy(F.rand(42))
    b = {r["shard"]: r["content_fp"] for r in shards.shard_manifest(shuffled, 4).collect()}
    assert a == b


def test_write_layout_and_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "out")
    manifest = shards.write_shards(docs, path, 4)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    # one data file per shard dir (repartition-by-shard prevents fan-out)
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert spark.read.parquet(f"{path}/_manifest").count() == 4
    ver = shards.verify_shards(back.drop("shard"), manifest, 4)
    assert all(r["ok"] for r in ver.collect())


def test_verify_detects_corruption(spark, docs):
    manifest = shards.shard_manifest(docs, 4)
    tampered = docs.withColumn(
        "text", F.when(F.col("doc_id") == 3, F.lit("EVIL")).otherwise(F.col("text"))
    )
    ver = {r["shard"]: r["ok"] for r in shards.verify_shards(tampered, manifest, 4).collect()}
    bad_shard = _md5_60("shard3") % 4
    assert ver[bad_shard] is False
    assert sum(1 for ok in ver.values() if not ok) == 1


def test_manifest_single_exchange_plan(spark, docs):
    m = shards.shard_manifest(docs, 8)
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one shuffle: the shard groupBy
    assert "BatchEvalPython" not in plan


def test_nshards_validation(spark, docs):
    with pytest.raises(ValueError):
        shards.assign_shards(docs, 0)
