"""Product quantization (PQ) — the memory-compression leg of the
similarity stack (FAISS-style IVF/PQ is public knowledge; cf. pipeline.
ivf for the cell-partitioned scan path).

A D-dim float vector becomes M one-byte-ish codes: split into M
subvectors, each assigned to its nearest of ``ksub`` per-subspace
centroids. Query-time ADC (asymmetric distance computation) sums
precomputed query↔centroid sub-distances by code — the corpus is
scanned as codes (M ints, ~D*4/M× smaller than the floats), never as
raw vectors.

Exact fixed-point discipline (what makes this ORACLE-ABLE, unlike
float PQ): vectors and centroids are quantized to integers q(x) =
floor(x·2^14 + 0.5) before any distance math, so encode (argmin of
integer squared-L2, ties to the lowest code) and ADC (integer sums) are
bit-exact on any engine — the DuckDB oracle replays them from the same
quantized-codebook literals. Precision loss vs float PQ is ~2^-14 per
coordinate — far below PQ's own quantization error.

100-TB design:
* codebooks are tiny (M × ksub × D/M ints) and broadcast; training runs
  on a bounded driver sample (same discipline as ivf.train_centroids);
* encoding is one Arrow pass (numpy batch distances), emitting
  (id, codes) — the only relation that persists; scans over codes move
  M small ints per row;
* ADC builds the M × ksub lookup table ONCE per query driver-side; the
  scan is numpy ``take``+sum per Arrow batch, then TakeOrderedAndProject
  for the top-k — no shuffle, no Python per row.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import pandas_udf

#: fixed-point scale: q(x) = floor(x * SCALE + 0.5)
SCALE = 1 << 14


def quantize(x: np.ndarray) -> np.ndarray:
    """floor(x·SCALE + 0.5) — NOT np.rint (ties-to-even) so SQL's
    floor(x*16384 + 0.5) reproduces it bit-for-bit."""
    return np.floor(np.asarray(x, dtype=np.float64) * SCALE + 0.5).astype(
        np.int64
    )


def synthetic_codebooks(m: int, ksub: int, dsub: int) -> np.ndarray:
    """Deterministic (M, ksub, dsub) int codebooks from a closed-form
    formula — the data-independent baseline the contract oracle pins
    (training quality is a recall concern, not a correctness one)."""
    i = np.arange(m)[:, None, None]
    j = np.arange(ksub)[None, :, None]
    k = np.arange(dsub)[None, None, :]
    return quantize(np.sin(1.0 + 1.7 * i + 0.31 * j + 0.13 * k))


def train_codebooks(
    df: DataFrame,
    vec_col: str,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    seed: int = 7,
    train_rows: int = 20_000,
    n_iter: int = 10,
) -> np.ndarray:
    """Per-subspace k-means on a bounded driver sample → quantized
    (M, ksub, dsub) int codebooks. Deterministic (seeded init, fixed
    iteration count); the returned codebooks are already fixed-point."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    sample = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .limit(train_rows)
        .toPandas()
    )
    X = np.vstack(sample["v"].to_numpy())
    if len(X) < ksub:
        raise ValueError(f"need >= {ksub} training vectors, got {len(X)}")
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.int64)
    for mi in range(m):
        S = X[:, mi * dsub : (mi + 1) * dsub]
        C = S[rng.choice(len(S), size=ksub, replace=False)].copy()
        for _ in range(n_iter):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(ksub):
                members = S[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books[mi] = quantize(C)
    return books


def encode_column(codebooks: np.ndarray, vec_col: str):
    """``array<int>`` PQ codes per vector: quantize, then per subspace the
    argmin of integer squared-L2 to the codebook rows (ties -> lowest
    code, numpy argmin's tie rule and the oracle's ORDER BY dist, j)."""
    B = np.asarray(codebooks, dtype=np.int64)
    m, ksub, dsub = B.shape

    @pandas_udf("array<int>")
    def enc(vecs: pd.Series) -> pd.Series:
        X = quantize(np.vstack(vecs.to_numpy()))
        codes = np.empty((len(X), m), dtype=np.int32)
        for mi in range(m):
            S = X[:, mi * dsub : (mi + 1) * dsub]
            d2 = ((S[:, None, :] - B[mi][None, :, :]) ** 2).sum(axis=2)
            codes[:, mi] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return enc(F.col(vec_col).cast("array<double>"))


def adc_lut(codebooks: np.ndarray, query: list) -> np.ndarray:
    """(M, ksub) integer query↔centroid sub-distances — the ADC lookup
    table, built once per query on the driver (M·ksub ints)."""
    B = np.asarray(codebooks, dtype=np.int64)
    m, ksub, dsub = B.shape
    q = quantize(np.asarray(query, dtype=np.float64))
    if len(q) != m * dsub:
        raise ValueError(f"query dim {len(q)} != {m * dsub}")
    lut = np.empty((m, ksub), dtype=np.int64)
    for mi in range(m):
        lut[mi] = ((B[mi] - q[mi * dsub : (mi + 1) * dsub][None, :]) ** 2).sum(
            axis=1
        )
    return lut


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query: list,
    id_col: str,
    code_col: str = "codes",
    k: int = 10,
) -> DataFrame:
    """ADC top-k over a PQ-encoded relation: per row, distance = sum of
    LUT[m, code_m] (one numpy take+sum per Arrow batch); ascending
    distance, ties by id. Returns (id, pq_dist, rank)."""
    lut = adc_lut(codebooks, query)

    @pandas_udf("long")
    def dist(codes: pd.Series) -> pd.Series:
        C = np.vstack(codes.to_numpy()).astype(np.int64)
        rows = np.arange(lut.shape[0])
        return pd.Series(lut[rows[None, :], C].sum(axis=1))

    scored = encoded.select(
        F.col(id_col), dist(F.col(code_col)).alias("pq_dist")
    )
    # orderBy+limit plans TakeOrderedAndProject (no global sort); the rank
    # window then runs over k rows only
    top = scored.orderBy(F.col("pq_dist").asc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("pq_dist").asc(), F.col(id_col).asc())
    return top.select(
        id_col, "pq_dist", F.row_number().over(w).alias("rank")
    )


def build_pq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_path: str,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    seed: int = 7,
    train_rows: int = 20_000,
) -> np.ndarray:
    """Train → encode → persist (id, codes) parquet + codebook JSON;
    returns the codebooks. The stored relation is the ~D·4/M×-smaller
    scan target for all future ADC queries."""
    books = train_codebooks(df, vec_col, dim, m, ksub, seed, train_rows)
    df.select(
        F.col(id_col), encode_column(books, vec_col).alias("codes")
    ).write.mode("overwrite").parquet(out_path)
    with open(os.path.join(out_path, "_pq_meta.json"), "w") as fh:
        json.dump(
            {
                "id_col": id_col,
                "dim": dim,
                "m": m,
                "ksub": ksub,
                "scale": SCALE,
                "codebooks": books.tolist(),
            },
            fh,
        )
    return books


def pq_index_topk(
    spark: SparkSession, index_path: str, query: list, k: int = 10
) -> DataFrame:
    """ADC top-k against a persisted PQ index."""
    with open(os.path.join(index_path, "_pq_meta.json")) as fh:
        meta = json.load(fh)
    encoded = spark.read.parquet(index_path)
    return pq_topk(
        encoded,
        np.asarray(meta["codebooks"], dtype=np.int64),
        query,
        meta["id_col"],
        k=k,
    )


# ---------------------------------------------------------------------------
# IVF+PQ: cell-partitioned codes — FAISS's IVFPQ composition of the two
# index legs (ivf.py cells prune WHICH files are read; PQ codes shrink WHAT
# is read). At 100 TB this is the configuration that actually ships:
# nprobe/n_cells of the files, M ints per row.
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_path: str,
    dim: int,
    n_cells: int = 64,
    m: int = 8,
    ksub: int = 16,
    seed: int = 7,
    train_rows: int = 20_000,
) -> None:
    """Train IVF centroids + PQ codebooks, write (id, codes) partitioned
    by ``__cell`` plus both metas. Residual-free (codes encode the raw
    vector, not the cell residual) — keeps encode cell-independent, so a
    vector's codes never change when cell counts are retuned."""
    from shaclapi_spark.pipeline import ivf

    C = ivf.train_centroids(df, vec_col, dim, n_cells, seed, train_rows)
    books = train_codebooks(df, vec_col, dim, m, ksub, seed, train_rows)
    (
        df.select(
            F.col(id_col),
            encode_column(books, vec_col).alias("codes"),
            ivf.cell_column(C, vec_col).alias("__cell"),
        )
        .write.partitionBy("__cell")
        .mode("overwrite")
        .parquet(out_path)
    )
    with open(os.path.join(out_path, "_ivfpq_meta.json"), "w") as fh:
        json.dump(
            {
                "id_col": id_col,
                "dim": dim,
                "n_cells": n_cells,
                "m": m,
                "ksub": ksub,
                "scale": SCALE,
                "centroids": C.tolist(),
                "codebooks": books.tolist(),
            },
            fh,
        )


def ivfpq_topk(
    spark: SparkSession,
    index_path: str,
    query: list,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ADC top-k over only the ``nprobe`` closest cells' code files (the
    ``__cell IN (...)`` filter is a partition filter — unprobed cells'
    files are never opened). nprobe >= n_cells degenerates to exact PQ
    over the full index (the oracle configuration, cf. ivf_topk)."""
    from shaclapi_spark.pipeline import ivf

    with open(os.path.join(index_path, "_ivfpq_meta.json")) as fh:
        meta = json.load(fh)
    cells = ivf.probe_cells(
        {"centroids": meta["centroids"]}, query, nprobe
    )
    cand = spark.read.parquet(index_path).filter(F.col("__cell").isin(*cells))
    return pq_topk(
        cand,
        np.asarray(meta["codebooks"], dtype=np.int64),
        query,
        meta["id_col"],
        k=k,
    )


def pq_topk_batch(
    encoded: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    q_id_col: str,
    q_vec_col: str,
    id_col: str,
    code_col: str = "codes",
    k: int = 10,
    chunk_queries: int = 4096,
    max_queries: int = 262_144,
) -> DataFrame:
    """ADC top-k for a whole RELATION of queries in ONE job per
    ``chunk_queries`` chunk (cf. similarity.ann_lsh_topk_batch /
    ivf.ivf_index_topk_batch — a job per query never amortizes). Each
    bounded query chunk is collected and its (chunk, M, ksub) LUT stack
    broadcast inside one Arrow pass that emits only each batch's
    per-query top-k candidates — k·chunk rows per batch, never the
    Q×corpus cross product — and a per-query window takes the global top
    k from the bounded candidate union.

    Driver memory is ENFORCED bounded: the LUT broadcast is at most
    chunk_queries × M × ksub longs (default 4096×16×256 ≈ 128 MB) per
    pass regardless of Q, and a query relation larger than
    ``max_queries`` raises rather than silently collecting — at that
    scale the probe side is itself big data, so route it through the
    LSH/IVF batch paths (which join the probe relation) or raise the cap
    deliberately after persisting ``encoded``.

    Returns (qid, id, pq_dist, rank); qid is stringified. Distances are
    the same exact fixed-point integers as ``pq_topk`` (probe-all PQ),
    so per-query results equal Q independent ``pq_topk`` calls."""
    B = np.asarray(codebooks, dtype=np.int64)
    m = B.shape[0]
    # over-read by one row so an oversized relation is detected without a
    # full count job
    qrows = queries.select(q_id_col, q_vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_topk_batch: query relation exceeds max_queries="
            f"{max_queries}; a probe side this large should go through a "
            "join-based batch path (ann_lsh_topk_batch / "
            "ivf_index_topk_batch) or raise max_queries explicitly"
        )
    if not qrows:
        return encoded.sparkSession.createDataFrame(
            [], f"qid string, {id_col} long, pq_dist long, rank int"
        )

    id_field = encoded.select(id_col).schema.fields[0]
    out_schema = (
        f"qid string, {id_field.name} {id_field.dataType.simpleString()}, "
        "pq_dist long"
    )
    codes = encoded.select(id_col, code_col)

    def chunk_candidates(chunk_rows):
        qids = [str(r[q_id_col]) for r in chunk_rows]
        # the closure ships the raw query vectors (chunk × D floats, ~MBs)
        # and each task materializes the (chunk, M, ksub) LUT stack ONCE
        # lazily — so N pending chunk closures never pin N LUT stacks
        # (each ~100 MB at M=16, ksub=256) on the driver simultaneously
        qvecs = [list(r[q_vec_col]) for r in chunk_rows]

        def gen(batches):
            luts = np.stack([adc_lut(B, v) for v in qvecs])
            for pdf in batches:
                C = np.vstack(pdf[code_col].to_numpy()).astype(np.int64)
                d = np.zeros((len(qids), len(C)), dtype=np.int64)
                for mi in range(m):
                    d += luts[:, mi, :][:, C[:, mi]]
                keep = min(k, len(C))
                rows = []
                ids = pdf[id_field.name].to_numpy()
                for qi, qid in enumerate(qids):
                    # (dist, id) lexsort so boundary TIES keep the
                    # smallest ids — the global window's tiebreak must
                    # already hold inside every batch or tied candidates
                    # get pruned
                    order = np.lexsort((ids, d[qi]))[:keep]
                    for j in order:
                        rows.append((qid, ids[j], int(d[qi, j])))
                yield pd.DataFrame(
                    rows, columns=["qid", id_field.name, "pq_dist"]
                )

        return codes.mapInPandas(gen, schema=out_schema)

    cand = chunk_candidates(qrows[:chunk_queries])
    for start in range(chunk_queries, len(qrows), chunk_queries):
        cand = cand.unionByName(
            chunk_candidates(qrows[start : start + chunk_queries])
        )
    w = Window.partitionBy("qid").orderBy(
        F.col("pq_dist").asc(), F.col(id_field.name).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
