"""Product quantization: fixed-point exactness, encode/ADC against an
independent numpy recomputation, trained-codebook recall sanity, and the
persisted-index round trip."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from shaclapi_spark.pipeline import pq


def test_quantize_matches_sql_floor():
    xs = [0.0, 1.0, -1.0, 0.5 / pq.SCALE, -0.5 / pq.SCALE, 0.123456, -7.89, 3.0000001]
    got = pq.quantize(np.array(xs))
    for x, g in zip(xs, got):
        sql = duckdb.sql(
            f"select cast(floor({x!r} * {pq.SCALE} + 0.5) as bigint)"
        ).fetchone()[0]
        assert g == sql, x


def test_synthetic_codebooks_deterministic():
    a = pq.synthetic_codebooks(8, 16, 8)
    b = pq.synthetic_codebooks(8, 16, 8)
    assert a.shape == (8, 16, 8) and np.array_equal(a, b)
    assert a.dtype == np.int64


def _np_encode(X, B):
    m, ksub, dsub = B.shape
    Xq = pq.quantize(X)
    codes = np.empty((len(X), m), dtype=int)
    for mi in range(m):
        d2 = ((Xq[:, mi * dsub : (mi + 1) * dsub][:, None, :] - B[mi][None]) ** 2).sum(2)
        codes[:, mi] = np.argmin(d2, axis=1)
    return Xq, codes


def test_encode_and_adc_exact(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 16)).astype(np.float64)
    B = pq.synthetic_codebooks(4, 8, 4)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    enc = df.select("vec_id", pq.encode_column(B, "embedding").alias("codes"))
    got = {r["vec_id"]: list(r["codes"]) for r in enc.collect()}
    _, codes = _np_encode(X, B)
    for i in range(len(X)):
        assert got[i] == list(codes[i])
    # ADC distance = LUT sum, checked against direct integer math
    query = [float(v) for v in rng.normal(size=16)]
    top = pq.pq_topk(enc, B, query, "vec_id", k=40).collect()
    lut = pq.adc_lut(B, query)
    expected = {
        i: int(sum(lut[mi, codes[i, mi]] for mi in range(4)))
        for i in range(len(X))
    }
    assert {r["vec_id"]: r["pq_dist"] for r in top} == expected
    ranks = [r["vec_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert ranks == sorted(expected, key=lambda i: (expected[i], i))


def test_trained_codebooks_recall(spark):
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(4, 32)) * 3
    X = np.vstack([c + rng.normal(size=(50, 32)) * 0.2 for c in centers])
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    B = pq.train_codebooks(df, "embedding", dim=32, m=4, ksub=8, train_rows=200)
    assert B.shape == (4, 8, 8)
    enc = df.select("vec_id", pq.encode_column(B, "embedding").alias("codes"))
    q = [float(v) for v in X[7]]
    top = [r["vec_id"] for r in pq.pq_topk(enc, B, q, "vec_id", k=5).collect()]
    # the query IS corpus vector 7; with cluster-trained codebooks its own
    # code must be among the closest few
    assert 7 in top


def test_train_validation(spark):
    df = spark.createDataFrame([(0, [0.0] * 10)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="divisible"):
        pq.train_codebooks(df, "embedding", dim=10, m=4)
    with pytest.raises(ValueError, match="training vectors"):
        pq.train_codebooks(df, "embedding", dim=10, m=2, ksub=16)


def test_index_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(9)
    X = rng.normal(size=(60, 16))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "pqidx")
    books = pq.build_pq_index(df, "vec_id", "embedding", path, dim=16, m=4, ksub=8, train_rows=60)
    q = [float(v) for v in rng.normal(size=16)]
    via_index = pq.pq_index_topk(spark, path, q, k=5).collect()
    enc = df.select("vec_id", pq.encode_column(books, "embedding").alias("codes"))
    direct = pq.pq_topk(enc, books, q, "vec_id", k=5).collect()
    assert [(r["vec_id"], r["pq_dist"]) for r in via_index] == [
        (r["vec_id"], r["pq_dist"]) for r in direct
    ]


def test_topk_plan_takeordered(spark):
    X = np.eye(8)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    B = pq.synthetic_codebooks(2, 4, 4)
    enc = df.select("vec_id", pq.encode_column(B, "embedding").alias("codes"))
    plan = (
        pq.pq_topk(enc, B, [0.1] * 8, "vec_id", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_ivfpq_probe_all_equals_pq(spark, tmp_path):
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 16)) * 3
    X = np.vstack([c + rng.normal(size=(30, 16)) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivfpq")
    pq.build_ivfpq_index(
        df, "vec_id", "embedding", path, dim=16,
        n_cells=4, m=4, ksub=8, train_rows=200,
    )
    q = [float(v) for v in X[3]]
    full = pq.ivfpq_topk(spark, path, q, k=8, nprobe=4).collect()
    # probe-all degenerates to exact PQ over the same codes
    import json as _json, os as _os
    meta = _json.load(open(_os.path.join(path, "_ivfpq_meta.json")))
    enc = spark.read.parquet(path).select("vec_id", "codes")
    direct = pq.pq_topk(
        enc, np.asarray(meta["codebooks"], dtype=np.int64), q, "vec_id", k=8
    ).collect()
    assert [(r["vec_id"], r["pq_dist"]) for r in full] == [
        (r["vec_id"], r["pq_dist"]) for r in direct
    ]
    # pruned probe: plan carries a __cell partition filter and the result
    # is a subset of cells' members
    pruned = pq.ivfpq_topk(spark, path, q, k=8, nprobe=1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__cell" in plan
    assert 0 < len(pruned.collect()) <= 8


def test_pq_topk_batch_matches_single(spark):
    rng = np.random.default_rng(13)
    X = rng.normal(size=(80, 16))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    B = pq.synthetic_codebooks(4, 8, 4)
    enc = df.select("vec_id", pq.encode_column(B, "embedding").alias("codes"))
    qs = [(j, [float(v) for v in rng.normal(size=16)]) for j in range(3)]
    qdf = spark.createDataFrame(qs, "qid long, qvec array<double>")
    batch = pq.pq_topk_batch(enc, B, qdf, "qid", "qvec", "vec_id", k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"], r["pq_dist"]))
    for j, qv in qs:
        single = pq.pq_topk(enc, B, qv, "vec_id", k=5).collect()
        expect = [(r["rank"], r["vec_id"], r["pq_dist"]) for r in single]
        assert sorted(got[str(j)]) == expect, j
    # empty query relation -> empty result, stable schema
    empty = pq.pq_topk_batch(enc, B, qdf.limit(0), "qid", "qvec", "vec_id")
    assert empty.count() == 0 and "rank" in empty.columns


def test_pq_topk_batch_chunked_and_guarded(spark):
    rng = np.random.default_rng(29)
    X = rng.normal(size=(60, 16))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    B = pq.synthetic_codebooks(4, 8, 4)
    enc = df.select("vec_id", pq.encode_column(B, "embedding").alias("codes"))
    qdf = spark.createDataFrame(
        [(j, [float(v) for v in rng.normal(size=16)]) for j in range(7)],
        "qid long, qvec array<double>",
    )
    inline = pq.pq_topk_batch(enc, B, qdf, "qid", "qvec", "vec_id", k=4)
    chunked = pq.pq_topk_batch(
        enc, B, qdf, "qid", "qvec", "vec_id", k=4, chunk_queries=2
    )
    key = lambda r: (r["qid"], r["rank"], r["vec_id"], r["pq_dist"])
    assert sorted(map(key, inline.collect())) == sorted(
        map(key, chunked.collect())
    )
    # a query relation past max_queries must raise, not silently collect
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_queries"):
        pq.pq_topk_batch(
            enc, B, qdf, "qid", "qvec", "vec_id", k=4, max_queries=3
        )
