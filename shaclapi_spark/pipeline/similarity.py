"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k: JVM-side `aggregate`/`zip_with` arithmetic —
  correctness baseline, O(N) per query, exact DuckDB oracle
  (list_cosine_similarity).
* LSH-bucketed ANN (random-hyperplane signs): the scale path — the corpus is
  hashed ONCE into 2^n_planes buckets; a query probes its own bucket (plus
  optional multi-probe neighbors), so per-query cost is corpus_size /
  2^n_planes. Hyperplanes are derived deterministically from a seed via
  xxhash64 so driver and executors agree without shipping matrices.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import pandas_udf

from shaclapi_spark.pipeline.dedup import drop_hot_groups


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_to_query(df: DataFrame, vec_col: str, query: list[float]) -> DataFrame:
    """Zero-norm vectors (and a zero query) yield NULL cosine instead of a
    DIVIDE_BY_ZERO job abort under ANSI mode; top-k drops them."""
    q = F.array(*[F.lit(float(v)) for v in query])
    qn = float(np.sqrt(np.dot(query, query)))
    v = F.col(vec_col).cast("array<double>")
    denom = _norm(v) * F.lit(qn)
    return df.withColumn(
        "cosine",
        F.when(denom > 0, _dot(v, q) / denom).otherwise(F.lit(None).cast("double")),
    )


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine. orderBy+limit compiles to TakeOrderedAndProject
    — a per-partition heap + driver merge, NOT a global sort shuffle."""
    return (
        cosine_to_query(df, vec_col, query)
        .select(F.col(id_col), "cosine")
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(seed: int, n_planes: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from a seed (no RNG state —
    reproducible across driver restarts and cluster sizes)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_column(vec_col: str, planes: np.ndarray):
    """Bucket id = sign bits of <v, plane_i>, packed into a long. JVM-side:
    the planes become array literals; each dot product is zip_with/aggregate."""
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(v, pl) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def _probe_masks(n_planes: int, multiprobe: int | None) -> list[int]:
    """Every XOR mask within Hamming radius `multiprobe` of a bucket id
    (0 flips, 1 flip, ... multiprobe flips), for any radius up to n_planes.
    ``None`` → all 2^n_planes masks (probe every bucket: the op degenerates
    to exact brute force — the contract-oracle configuration)."""
    if multiprobe is None:
        return list(range(1 << n_planes))
    if not 0 <= multiprobe <= n_planes:
        raise ValueError(
            f"multiprobe must be in [0, n_planes={n_planes}] or None "
            f"(probe all); got {multiprobe}"
        )
    from itertools import combinations

    return [
        sum(1 << i for i in flips)
        for r in range(multiprobe + 1)
        for flips in combinations(range(n_planes), r)
    ]


def ann_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    multiprobe: int | None = 1,
) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's LSH bucket plus
    all buckets within `multiprobe` bit flips (any radius up to n_planes;
    ``None`` probes every bucket — exact brute force through the same
    machinery), then exact cosine top-k inside. At scale the bucket column
    is precomputed+partitioned-by; here it is computed on the fly."""
    dim = len(query)
    planes = _hyperplanes(seed, n_planes, dim)
    qbits = int(
        sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, query)) >= 0)
    )
    probe = sorted({qbits ^ m for m in _probe_masks(n_planes, multiprobe)})
    bucketed = df.withColumn("__bucket", lsh_bucket_column(vec_col, planes))
    cand = bucketed.filter(F.col("__bucket").isin(*probe))
    return brute_force_topk(cand, id_col, vec_col, query, k)


# ---------------------------------------------------------------------------
# persisted ANN index: bucket ONCE, probe via partition pruning
# ---------------------------------------------------------------------------

def _probe_set(
    query: list[float], planes: np.ndarray, multiprobe: int | None
) -> list[int]:
    n_planes = len(planes)
    qbits = int(
        sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, query)) >= 0)
    )
    return sorted({qbits ^ m for m in _probe_masks(n_planes, multiprobe)})


def build_ann_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_path: str,
    dim: int,
    n_planes: int = 6,
    seed: int = 42,
) -> None:
    """One-time index build: bucket the corpus with the hyperplane LSH and
    write it PARTITIONED BY the bucket column. This is the 100-TB path the
    on-the-fly `ann_lsh_topk` cannot offer: a query probes |probe| of the
    2^n_planes directory partitions and the scan never touches the rest
    (partition pruning — PartitionFilters in the plan, no data files read
    outside the probed buckets). Hyperplanes are a pure function of
    (seed, n_planes, dim), recorded in `_ann_meta.json`, so any session can
    recompute the query's probe set without reading the index."""
    planes = _hyperplanes(seed, n_planes, dim)
    (
        df.withColumn("__bucket", lsh_bucket_column(vec_col, planes))
        .write.partitionBy("__bucket")
        .mode("overwrite")
        .parquet(out_path)
    )
    with open(os.path.join(out_path, "_ann_meta.json"), "w") as fh:
        json.dump(
            {
                "id_col": id_col,
                "vec_col": vec_col,
                "dim": dim,
                "n_planes": n_planes,
                "seed": seed,
            },
            fh,
        )


def ann_index_probe(
    spark: SparkSession,
    index_path: str,
    query: list[float],
    multiprobe: int = 1,
) -> DataFrame:
    """The pruned candidate scan for one query: only the probed `__bucket`
    partitions are read."""
    with open(os.path.join(index_path, "_ann_meta.json")) as fh:
        meta = json.load(fh)
    planes = _hyperplanes(meta["seed"], meta["n_planes"], meta["dim"])
    probe = _probe_set(query, planes, multiprobe)
    idx = spark.read.parquet(index_path)
    return idx.filter(F.col("__bucket").isin(*probe))


def ann_index_topk(
    spark: SparkSession,
    index_path: str,
    query: list[float],
    k: int = 10,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k against a persisted index — identical semantics to
    `ann_lsh_topk` built with the same (seed, n_planes), but per-query cost
    is |probe|/2^n_planes of the corpus instead of a full scan + hash."""
    with open(os.path.join(index_path, "_ann_meta.json")) as fh:
        meta = json.load(fh)
    cand = ann_index_probe(spark, index_path, query, multiprobe)
    return brute_force_topk(cand, meta["id_col"], meta["vec_col"], query, k)


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (dedup family)
# ---------------------------------------------------------------------------

def _pair_cosine(av, bv):
    """Cosine between two array<double> columns; NULL when either norm is 0
    (zero vectors are no-ops for near-dup, never a DIVIDE_BY_ZERO abort)."""
    denom = _norm(av) * _norm(bv)
    return F.when(denom > 0, _dot(av, bv) / denom).otherwise(
        F.lit(None).cast("double")
    )


def embedding_neardup_pairs_exact(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All (a, b) pairs with cosine >= threshold, a < b, by exact all-pairs
    cosine. O(N^2) — the correctness baseline / verification step, mirroring
    `jaccard_pairs` for MinHash: run it on a candidate subset or a sampled
    audit slice, never the full 100-TB corpus (that's what
    `embedding_neardups` is for). JVM-side zip_with/aggregate arithmetic,
    no Python in the loop."""
    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col), v.alias("__vec"))
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("__vec").alias("__va")
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("__vec").alias("__vb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _pair_cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def neardup_band_geometry(
    n: int,
    threshold: float = 0.9,
    target_recall: float = 0.99,
    target_bucket: int = 64,
    min_band_bits: int = 6,
    max_band_bits: int = 24,
) -> tuple[int, int]:
    """(n_bands, band_bits) sized for a corpus of ~``n`` vectors.

    The candidate law of banded sign-bit LSH: two UNRELATED vectors share
    a given band bucket with probability ~2^-band_bits, so expected
    random candidates ≈ n_bands * n^2 / 2^(band_bits+1). A fixed
    band_bits is therefore bench-scale only — band_bits must grow with
    log2(n) to keep the per-bucket occupancy (n / 2^band_bits) bounded.
    This helper picks band_bits = clamp(ceil(log2(n / target_bucket)))
    so a RANDOM corpus puts ~target_bucket vectors in each band bucket,
    then re-solves n_bands for the target recall at the cosine
    threshold: recall = 1 - (1 - p^band_bits)^n_bands with
    p = 1 - arccos(threshold)/pi (probability one hyperplane agrees).
    """
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    band_bits = min_band_bits
    if n > target_bucket:
        band_bits = max(
            min_band_bits,
            min(max_band_bits, math.ceil(math.log2(n / target_bucket))),
        )
    p_band = p**band_bits
    if p_band >= 1.0:
        n_bands = 1
    else:
        n_bands = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band)))
    return n_bands, band_bits


def embedding_neardups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.9,
    n_bands: int | None = None,
    band_bits: int | None = None,
    seed: int = 7,
    est_count: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine — the 100-TB scale path.

    Banded random-hyperplane LSH blocking (the SimHash/banded-MinHash recipe
    applied to dense vectors): each vector gets `n_bands` bucket keys of
    `band_bits` sign bits; candidates are pairs sharing >=1 (band, bucket)
    key — an equi-join on the bucket key, never an all-pairs comparison —
    then every candidate is verified with the exact cosine. Precision is
    therefore 1.0; recall is the banded-LSH probability
    1 - (1 - p^band_bits)^n_bands with p = 1 - theta/pi.

    SCALE LAW (why band geometry is auto-derived): expected RANDOM
    candidate pairs ≈ n_bands * n^2 / 2^(band_bits+1) — a fixed
    band_bits (e.g. 6 → 64 buckets/band) is quadratic-candidate at
    n ≫ 10^6 no matter how sound the join shape is. When ``n_bands`` /
    ``band_bits`` are None (the default) they are derived by
    :func:`neardup_band_geometry` from the corpus count — ``est_count``
    if the caller knows it (at 100 TB pass the table's row-count
    metadata; never count a petabyte to size a parameter), else a
    `count()` of the already-persisted base relation (cheap: it also
    primes the cache the banding pass reads next). ``max_bucket``
    optionally drops (band, bucket) groups larger than the cap via a
    broadcast anti-join BEFORE the candidate self-join — the stop-bucket
    defusal for degenerate corpora (e.g. a zero/constant-vector cluster)
    whose hot buckets stay quadratic at ANY band width.

    `dim` is the embedding width (planes are a pure function of
    (seed, n_bands*band_bits, dim), so driver and executors agree without
    shipping matrices).

    Plan shape (cf. minhash_lsh_neardups, round-1 lesson): the bucketed base
    relation fans out into the a-side, b-side and both verify joins, so it is
    persisted before reuse; candidate pairs are persisted before the two
    vector re-joins. Shuffles move (id, 8-byte bucket) pairs and, for
    verification only, the candidate subset's vectors.
    """
    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col).alias("__id"), v.alias("__vec"))
    base = base.persist()

    if n_bands is None or band_bits is None:
        n = est_count if est_count is not None else base.count()
        auto_bands, auto_bits = neardup_band_geometry(max(1, n), threshold)
        n_bands = auto_bands if n_bands is None else n_bands
        band_bits = auto_bits if band_bits is None else band_bits

    # n_bands*band_bits sign-bit dot products per vector: as literal
    # zip_with/aggregate expressions this is a megabyte of codegen per task
    # (measured 70+ s of plan+JIT for 128 planes); one Arrow-batched numpy
    # matmul is the fast path. Planes are re-derived from (seed, dim) inside
    # the UDF — a pure function, nothing shipped in the closure.
    @pandas_udf("array<long>")
    def band_buckets(vecs: pd.Series) -> pd.Series:
        planes = _hyperplanes(seed, n_bands * band_bits, dim)
        M = np.vstack(vecs.to_numpy())                      # (batch, dim)
        bits = (M @ planes.T) >= 0                          # (batch, planes)
        weights = 1 << np.arange(band_bits, dtype=np.int64)
        out = np.einsum(
            "nbr,r->nb",
            bits.reshape(len(M), n_bands, band_bits).astype(np.int64),
            weights,
        )
        return pd.Series(list(out))

    keys_cached = None
    try:
        keys = base.select(
            "__id",
            F.posexplode(band_buckets(F.col("__vec"))).alias("band", "bucket"),
        )
        if max_bucket is not None:
            # the capped path consumes `keys` three times (hot-bucket agg +
            # both join sides) — persist so the Arrow banding pass runs once
            keys = keys_cached = keys.persist()
            keys = drop_hot_groups(keys, ["band", "bucket"], max_bucket)
        a = keys.select(F.col("__id").alias("id_a"), "band", "bucket")
        b = keys.select(F.col("__id").alias("id_b"), "band", "bucket")
        cand = (
            a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .persist()
        )
        va = base.select(F.col("__id").alias("id_a"), F.col("__vec").alias("__va"))
        vb = base.select(F.col("__id").alias("id_b"), F.col("__vec").alias("__vb"))
        out = (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .withColumn("cosine", _pair_cosine(F.col("__va"), F.col("__vb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )
        # materialize before unpersisting the upstream fan-out points
        out = out.localCheckpoint(eager=True)
    finally:
        base.unpersist()
        if keys_cached is not None:
            keys_cached.unpersist()
        try:
            cand.unpersist()
        except NameError:
            pass
    return out


def ann_lsh_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    multiprobe: int | None = 1,
) -> DataFrame:
    """Top-k cosine neighbors for a whole RELATION of queries in ONE job —
    the shape batch inference / dedup-against-index actually runs at scale,
    where a job per query can never amortize. Returns
    (q_id, id, cosine, rank) with rank 1..k per query.

    Plan: corpus rows get their LSH bucket once; each query row explodes
    into its probe buckets (own bucket XOR a LITERAL mask set — masks are
    plan constants, so probe fan-out is a generator, not a join); the
    candidate set is the bucket equi-join with the (broadcast) probe side;
    exact cosine + a per-query window take the top k. Shuffles touch only
    candidates: corpus never re-partitions when the probe side broadcasts.

    ``multiprobe=None`` probes ALL 2^n_planes buckets — the op degenerates
    to exact brute force while exercising the identical probe/join/window
    machinery (the contract-oracle configuration, cf. ivf_topk at
    nprobe=n_cells); small multiprobe values trade recall for candidate
    count exactly like `ann_lsh_topk`."""
    planes = _hyperplanes(seed, n_planes, dim)
    masks = _probe_masks(n_planes, multiprobe)
    bucketed = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__bucket", lsh_bucket_column("__cv", planes))
    probes = (
        queries.select(
            F.col(q_id_col).alias("__qid"),
            F.col(q_vec_col).cast("array<double>").alias("__qv"),
        )
        .withColumn("__qbucket", lsh_bucket_column("__qv", planes))
        .withColumn("__mask", F.explode(F.array(*[F.lit(m) for m in masks])))
        .withColumn("__bucket", F.col("__qbucket").bitwiseXOR(F.col("__mask")))
        .select("__qid", "__qv", "__bucket")
    )
    cand = bucketed.join(F.broadcast(probes), "__bucket")
    scored = cand.withColumn(
        "cosine", _pair_cosine(F.col("__cv"), F.col("__qv"))
    ).filter(F.col("cosine").isNotNull())
    from pyspark.sql import Window

    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("__qid").alias("q_id"), F.col(id_col), "cosine", "rank")
    )


def hard_negatives(
    base: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    label_col: str,
    q_label_col: str,
    k: int = 10,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every query, the
    k most-similar BASE vectors with a DIFFERENT label — the pairs a
    retrieval/embedding trainer most needs (easy negatives are random;
    hard ones sit just across the decision boundary). Output:
    (q_id, id, cosine, rank), rank 1..k per query by
    (cosine DESC, id ASC) — tie-stable.

    Plan shape: the query relation (with labels) is broadcast against one
    corpus scan — label mismatch filters BEFORE the ranking cut, so a
    same-label twin can never displace a true negative; the per-query
    top-k is a WindowGroupLimit (k-row heap per task, no full sort). For
    corpus-scale query relations, compose the same mismatch filter with
    the IVF/LSH probe path instead of the broadcast scan (probe with
    headroom > k, filter, re-rank)."""
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("__qv"),
        F.col(q_label_col).alias("__ql"),
    )
    b = base.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__bv"),
        F.col(label_col).alias("__bl"),
    )
    scored = (
        b.join(F.broadcast(q), F.col("__bl") != F.col("__ql"))
        .withColumn("cosine", _pair_cosine(F.col("__qv"), F.col("__bv")))
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "cosine", F.col("rank").cast("int").alias("rank"))
    )


def matryoshka_recall(
    base: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    dims: list,
    full_dim: int,
    k: int = 10,
) -> DataFrame:
    """Matryoshka / truncated-embedding retrieval evaluation: for every
    query and every prefix length d in ``dims``, how many of the TRUE
    top-k neighbors (full ``full_dim`` cosine) the d-prefix cosine
    retrieves in ITS top-k — (q_id, dim, overlap). overlap/k is recall@k
    of the truncation; the curve tells a pipeline how many dims it can
    store/ship (d×4 bytes per vector of index) before retrieval degrades.

    Both rankings break ties by (cosine DESC, id ASC), so overlap is an
    exact integer relation reproducible cross-engine.

    Plan shape: queries broadcast; per evaluated dim one corpus-scan
    scoring pass + one WindowGroupLimit top-k (k-row heap per task); the
    dim passes are a union, executed in one job. The full-dim ranking is
    computed once and reused across dims via an inner join on the
    (q_id, id) hit set."""
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("__qv"),
    )
    b = base.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__bv"),
    )
    scored = b.join(F.broadcast(q), F.lit(True))

    def topk(dim: int) -> DataFrame:
        cos = _pair_cosine(
            F.slice(F.col("__qv"), 1, int(dim)), F.slice(F.col("__bv"), 1, int(dim))
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("__c").desc(), F.col("__id").asc()
        )
        return (
            scored.withColumn("__c", cos)
            .filter(F.col("__c").isNotNull())
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .select("q_id", "__id")
        )

    full = topk(int(full_dim)).persist()
    try:
        parts = []
        for d in dims:
            if int(d) == int(full_dim):
                # the full-dim ranking overlaps itself exactly — count the
                # persisted hit set instead of re-running the corpus scan
                hit = full
            else:
                hit = topk(int(d)).join(full, ["q_id", "__id"])
            parts.append(
                hit.groupBy("q_id")
                .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
                .withColumn("dim", F.lit(int(d)))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # queries whose truncated top-k misses everything still get a row
        qs = q.select("q_id")
        out = (
            qs.crossJoin(
                out.sparkSession.createDataFrame(
                    [(int(d),) for d in dims], "dim int"
                )
            )
            .join(out, ["q_id", "dim"], "left")
            .withColumn("overlap", F.coalesce("overlap", F.lit(0).cast("long")))
            .localCheckpoint(eager=True)
        )
    finally:
        full.unpersist()
    return out.select("q_id", F.col("dim").cast("int").alias("dim"), "overlap")
