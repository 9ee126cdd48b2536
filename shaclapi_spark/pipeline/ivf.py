"""IVF (inverted-file) ANN index — the centroid-partitioned scale path.

Complements the hyperplane-LSH index in `pipeline.similarity`: instead of
data-independent random buckets, vectors are assigned to their nearest of
`n_cells` spherical-k-means centroids and the corpus is written PARTITIONED
BY cell; a query scans only its `nprobe` closest cells (classic IVF-Flat,
as in FAISS — public knowledge). Trade-off vs LSH: data-adaptive cells give
better recall/scan-fraction on clustered corpora, at the cost of a training
step.

100-TB design:
* training runs on a bounded driver-side sample (industry-standard for IVF;
  centroids are tiny: n_cells × dim floats) — the ONLY driver-side data
  movement, explicitly capped by `train_rows`;
* assignment is one Arrow-batched numpy matmul per batch (vectorized
  pandas_udf, no per-row Python), a single narrow pass over the corpus;
* the index write is one shuffle (partitionBy cell); probes read
  `nprobe / n_cells` of the data files via partition pruning — the same
  PartitionFilters mechanics as `build_ann_index`, verified in tests;
* centroids are persisted in `_ivf_meta.json`, so any session can rank
  cells for a query without touching the corpus.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from shaclapi_spark.pipeline.similarity import brute_force_topk


def _unit_rows(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def train_centroids(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_cells: int = 64,
    seed: int = 11,
    train_rows: int = 20_000,
    n_iter: int = 10,
) -> np.ndarray:
    """Spherical k-means on a bounded sample → (n_cells, dim) unit centroids.

    Deterministic: k-means++-style seeding and iteration order come from a
    seeded Generator. `limit(train_rows)` bounds driver memory regardless of
    corpus size (FAISS trains IVF coarse quantizers on samples the same way).
    """
    sample = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .filter(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x) > 0)
        .limit(train_rows)
        .toPandas()
    )
    M = _unit_rows(np.vstack(sample["v"].to_numpy()))
    rng = np.random.default_rng(seed)
    if len(M) < n_cells:
        raise ValueError(f"need >= {n_cells} non-zero training vectors, got {len(M)}")
    # k-means++ seeding on cosine distance (1 - dot on unit vectors)
    centroids = [M[rng.integers(len(M))]]
    for _ in range(1, n_cells):
        d = 1.0 - np.max(np.vstack(centroids) @ M.T, axis=0)
        d = np.clip(d, 1e-12, None)
        centroids.append(M[rng.choice(len(M), p=d / d.sum())])
    C = np.vstack(centroids)
    for _ in range(n_iter):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(n_cells):
            members = M[assign == c]
            if len(members):
                C[c] = members.sum(axis=0)
        C = _unit_rows(C)
    return C


def cell_column(centroids: np.ndarray, vec_col: str):
    """`__cell` = argmax cosine(v, centroid): one numpy matmul per Arrow
    batch. Unnormalized input is fine — argmax of dot with unit centroids
    equals argmax of cosine for any fixed ``v`` norm; zero vectors land in
    cell 0 (their cosine is NULL downstream, so placement is moot)."""
    C = _unit_rows(centroids.copy())

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    return assign(F.col(vec_col).cast("array<double>"))


def build_ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_path: str,
    dim: int,
    n_cells: int = 64,
    seed: int = 11,
    train_rows: int = 20_000,
) -> None:
    """Train → assign → write partitioned by `__cell` (+ `_ivf_meta.json`)."""
    C = train_centroids(df, vec_col, dim, n_cells, seed, train_rows)
    (
        df.withColumn("__cell", cell_column(C, vec_col))
        .write.partitionBy("__cell")
        .mode("overwrite")
        .parquet(out_path)
    )
    with open(os.path.join(out_path, "_ivf_meta.json"), "w") as fh:
        json.dump(
            {
                "id_col": id_col,
                "vec_col": vec_col,
                "dim": dim,
                "n_cells": n_cells,
                "centroids": C.tolist(),
            },
            fh,
        )


def _load_meta(index_path: str) -> dict:
    with open(os.path.join(index_path, "_ivf_meta.json")) as fh:
        return json.load(fh)


def probe_cells(meta: dict, query: list[float], nprobe: int) -> list[int]:
    C = np.asarray(meta["centroids"])
    order = np.argsort(-(C @ np.asarray(query, dtype=float)))
    return [int(c) for c in order[: max(1, nprobe)]]


def ivf_index_probe(
    spark: SparkSession, index_path: str, query: list[float], nprobe: int = 4
) -> DataFrame:
    """Candidate scan touching only the `nprobe` closest cells (partition
    pruning: the `__cell IN (...)` filter never opens the other cells'
    files)."""
    meta = _load_meta(index_path)
    cells = probe_cells(meta, query, nprobe)
    return spark.read.parquet(index_path).filter(F.col("__cell").isin(*cells))


def ivf_index_topk(
    spark: SparkSession,
    index_path: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via the IVF index. With nprobe >= n_cells
    this degenerates to exact brute force over the whole index (useful as a
    correctness oracle); small nprobe scans ~nprobe/n_cells of the corpus."""
    meta = _load_meta(index_path)
    cand = ivf_index_probe(spark, index_path, query, nprobe)
    return brute_force_topk(cand, meta["id_col"], meta["vec_col"], query, k)


def cells_column(centroids: np.ndarray, vec_col: str, nprobe: int):
    """`array<int>` of the ``nprobe`` nearest cells per vector — the batch
    analog of `probe_cells`, one numpy matmul + argsort per Arrow batch."""
    C = _unit_rows(centroids.copy())
    n = max(1, int(nprobe))

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())
        order = np.argsort(-(M @ C.T), axis=1)[:, :n].astype(np.int32)
        return pd.Series(list(order))

    return assign(F.col(vec_col).cast("array<double>"))


def ivf_index_topk_batch(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    q_id_col: str,
    q_vec_col: str,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k for a whole RELATION of queries against the IVF index in ONE
    job (cf. similarity.ann_lsh_topk_batch — a job per query never
    amortizes at scale). Each query row fans out to its ``nprobe`` nearest
    cells via one Arrow matmul; the (broadcast) probe side joins the index
    on the `__cell` PARTITION column, so Spark's dynamic partition pruning
    keeps unprobed cells' files unread; exact cosine + a per-query window
    take the top k. nprobe >= n_cells degenerates to exact brute force
    (the contract-oracle configuration, cf. ivf_topk)."""
    from shaclapi_spark.pipeline.similarity import _pair_cosine

    meta = _load_meta(index_path)
    C = np.asarray(meta["centroids"])
    probes = (
        queries.select(
            F.col(q_id_col).alias("__qid"),
            F.col(q_vec_col).cast("array<double>").alias("__qv"),
        )
        .withColumn("__cell", F.explode(cells_column(C, "__qv", nprobe)))
        .select("__qid", "__qv", "__cell")
    )
    idx = spark.read.parquet(index_path).select(
        F.col(meta["id_col"]),
        F.col(meta["vec_col"]).cast("array<double>").alias("__cv"),
        "__cell",
    )
    cand = idx.join(F.broadcast(probes), "__cell")
    scored = cand.withColumn(
        "cosine", _pair_cosine(F.col("__cv"), F.col("__qv"))
    ).filter(F.col("cosine").isNotNull())
    from pyspark.sql import Window

    w = Window.partitionBy("__qid").orderBy(
        F.col("cosine").desc(), F.col(meta["id_col"])
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias("q_id"), F.col(meta["id_col"]), "cosine", "rank"
        )
    )
