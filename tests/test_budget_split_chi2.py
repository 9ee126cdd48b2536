"""budget_cut, leakage_free_split, chi2 drift — this session's ops."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from shaclapi_spark.ops import drift
from shaclapi_spark.pipeline import cluster, dedup, sampling

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# ---------------------------------------------------------------------------
# budget_cut
# ---------------------------------------------------------------------------

def _naive_cut(rows, budget):
    """Reference: largest prefix by (prio desc, id asc) with sum <= budget."""
    kept, acc = [], 0
    for rid, tok, prio in sorted(rows, key=lambda r: (-r[2], r[0])):
        if acc + tok > budget:
            break
        acc += tok
        kept.append((rid, acc))
    return kept


def test_budget_cut_matches_naive_prefix(spark, docs):
    rows = [
        (r.doc_id, r.n_chars, r.n_chars)
        for r in docs.select("doc_id", "n_chars").collect()
    ]
    want = dict(_naive_cut(rows, 20_000))
    got = {
        r.doc_id: r.cum_tokens
        for r in sampling.budget_cut(
            docs.withColumn("prio", F.col("n_chars")),
            "doc_id",
            "n_chars",
            "prio",
            budget=20_000,
            boundaries=[800, 400, 200, 100],
        ).collect()
    }
    assert got == want


def test_budget_cut_boundary_doc_dropped_not_split(spark):
    # 3 docs of 10 tokens each, budget 25: exactly two kept, never a partial
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 4), (3, 10, 3)], "id long, tok long, prio long"
    )
    got = sampling.budget_cut(df, "id", "tok", "prio", budget=25, boundaries=[4])
    assert sorted((r.id, r.cum_tokens) for r in got.collect()) == [(1, 10), (2, 20)]


def test_budget_cut_tie_broken_by_id(spark):
    df = spark.createDataFrame(
        [(9, 10, 7), (1, 10, 7), (5, 10, 7)], "id long, tok long, prio long"
    )
    got = sampling.budget_cut(df, "id", "tok", "prio", budget=20, boundaries=[7])
    assert sorted(r.id for r in got.collect()) == [1, 5]


def test_budget_cut_zero_and_overflow_budgets(spark):
    df = spark.createDataFrame([(1, 10, 1)], "id long, tok long, prio long")
    assert sampling.budget_cut(df, "id", "tok", "prio", 0, boundaries=[1]).count() == 0
    assert sampling.budget_cut(df, "id", "tok", "prio", 10, boundaries=[1]).count() == 1
    with pytest.raises(ValueError):
        sampling.budget_cut(df, "id", "tok", "prio", -1, boundaries=[1])


def test_budget_cut_dead_buckets_filtered_before_window(spark, docs):
    # buckets whose global offset exceeds the budget never reach the sort:
    # with a tiny budget only the top-priority bucket survives the filter
    plan = sampling.budget_cut(
        docs.withColumn("prio", F.col("n_chars")),
        "doc_id",
        "n_chars",
        "prio",
        budget=1,
        boundaries=[800, 400, 200, 100],
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "__b" in plan  # bucket filter is part of the plan, not driver-side


# ---------------------------------------------------------------------------
# leakage_free_split
# ---------------------------------------------------------------------------

def test_leakage_split_no_cross_split_pairs(spark, docs):
    d120 = docs.filter(F.col("doc_id") < 120)
    pairs = dedup.jaccard_pairs(d120, "doc_id", "text", k=5, threshold=0.2)
    split = cluster.leakage_free_split(
        docs, pairs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")
    crossed = (
        pairs.join(
            split.select(F.col("doc_id").alias("a"), F.col("split").alias("sa")), "a"
        )
        .join(
            split.select(F.col("doc_id").alias("b"), F.col("split").alias("sb")), "b"
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossed == 0
    # every doc assigned exactly once, all three splits populated
    assert split.count() == docs.count()
    names = {r.split for r in split.select("split").distinct().collect()}
    assert names <= {"train", "val", "test"}


def test_leakage_split_deterministic_and_fraction_shaped(spark, docs):
    pairs = spark.createDataFrame([], "a long, b long")
    s1 = cluster.leakage_free_split(
        docs, pairs, "doc_id", {"train": 0.5, "val": 0.5}
    )
    s2 = cluster.leakage_free_split(
        docs, pairs, "doc_id", {"train": 0.5, "val": 0.5}
    )
    assert s1.exceptAll(s2).count() == 0
    counts = {r.split: r["count"] for r in s1.groupBy("split").count().collect()}
    total = sum(counts.values())
    assert abs(counts.get("train", 0) / total - 0.5) < 0.1


def test_leakage_split_salt_decorrelates(spark, docs):
    pairs = spark.createDataFrame([], "a long, b long")
    a = cluster.leakage_free_split(docs, pairs, "doc_id", {"x": 0.5, "y": 0.5})
    b = cluster.leakage_free_split(
        docs, pairs, "doc_id", {"x": 0.5, "y": 0.5}, salt="other"
    )
    moved = (
        a.select("doc_id", F.col("split").alias("s1"))
        .join(b.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .filter(F.col("s1") != F.col("s2"))
        .count()
    )
    assert moved > 0


def test_leakage_split_bad_fractions_raise(spark, docs):
    pairs = spark.createDataFrame([], "a long, b long")
    with pytest.raises(ValueError):
        cluster.leakage_free_split(docs, pairs, "doc_id", {"a": 0.5, "b": 0.2})
    with pytest.raises(ValueError):
        cluster.leakage_free_split(docs, pairs, "doc_id", {})


# ---------------------------------------------------------------------------
# chi-square drift
# ---------------------------------------------------------------------------

def test_chi2_groups_matches_numpy_reference(spark, docs):
    got = sorted(
        (r.bin, r.n_a, r.n_b, r.chi2_ppm)
        for r in drift.chi2_groups(
            docs, "n_chars", F.col("source") == "src0", 0.0, 2000.0, 16
        ).collect()
    )
    rows = docs.select("n_chars", "source").collect()
    bins_a = np.zeros(16, dtype=np.int64)
    bins_b = np.zeros(16, dtype=np.int64)
    for r in rows:
        if r.n_chars is None:
            continue
        b = min(15, max(0, int(np.floor((float(r.n_chars) - 0.0) / 125.0))))
        (bins_a if r.source == "src0" else bins_b)[b] += 1
    N, M = int(bins_a.sum()), int(bins_b.sum())
    want = []
    for b in range(16):
        t = int(bins_a[b] + bins_b[b])
        if t == 0:
            continue
        d = int(bins_a[b]) * M - int(bins_b[b]) * N
        want.append(
            (b, int(bins_a[b]), int(bins_b[b]), (1_000_000 * d * d) // (N * M * t))
        )
    assert got == sorted(want)
    # sanity: sum(chi2_ppm)/1e6 equals the float statistic within n_bins ulp
    stat = sum(c for *_x, c in got) / 1e6
    f = 0.0
    for b in range(16):
        t = bins_a[b] + bins_b[b]
        if t:
            d = bins_a[b] * M - bins_b[b] * N
            f += d * d / (N * M * t)
    assert abs(stat - f) < 16 / 1e6 + 1e-9


def test_chi2_gof_zero_for_perfect_fit_and_grows_with_n():
    ref = np.array([0.25, 0.25, 0.25, 0.25])
    assert drift.chi2_gof(np.array([25, 25, 25, 25]), ref) == pytest.approx(0.0)
    small = drift.chi2_gof(np.array([30, 20, 25, 25]), ref)
    big = drift.chi2_gof(np.array([300, 200, 250, 250]), ref)
    assert big == pytest.approx(10 * small, rel=1e-9)
    assert small > 0


# ---------------------------------------------------------------------------
# hard negatives + quality budget curve
# ---------------------------------------------------------------------------

def test_hard_negatives_excludes_same_label(spark):
    from shaclapi_spark.pipeline import similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    hn = sim.hard_negatives(
        emb, q, "vec_id", "embedding", "vec_id", "embedding", "label", "label", k=5
    )
    rows = hn.collect()
    assert rows
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in rows:
        assert labels[r.q_id] != labels[r.vec_id]  # never a same-label hit
        assert 1 <= r.rank <= 5
    # per query: ranks are 1..k and cosine is non-increasing
    by_q = {}
    for r in sorted(rows, key=lambda r: (r.q_id, r.rank)):
        by_q.setdefault(r.q_id, []).append(r.cosine)
    for cs in by_q.values():
        assert cs == sorted(cs, reverse=True)


def test_hard_negatives_matches_exact_topk(spark):
    from shaclapi_spark.pipeline import similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q_row = emb.filter(F.col("vec_id") == 0).collect()[0]
    got = [
        (r.vec_id, round(r.cosine, 9))
        for r in sim.hard_negatives(
            emb,
            emb.filter(F.col("vec_id") == 0),
            "vec_id", "embedding", "vec_id", "embedding", "label", "label",
            k=5,
        )
        .orderBy("rank")
        .collect()
    ]
    qv = np.array(q_row.embedding, dtype=np.float64)
    cands = []
    for r in emb.collect():
        if r.label == q_row.label:
            continue
        v = np.array(r.embedding, dtype=np.float64)
        denom = np.linalg.norm(qv) * np.linalg.norm(v)
        if denom == 0:
            continue
        cands.append((r.vec_id, float(qv @ v / denom)))
    want = [
        (i, round(c, 9))
        for i, c in sorted(cands, key=lambda t: (-t[1], t[0]))[:5]
    ]
    assert got == want


def test_quality_budget_curve_cumsums(spark, docs):
    from shaclapi_spark.pipeline import curate as cu

    curve = (
        cu.quality_budget_curve(
            docs.withColumn("score", F.col("n_chars") / F.lit(2000.0)),
            "score",
            "n_chars",
            n_buckets=20,
        )
        .orderBy(F.col("bucket").desc())
        .collect()
    )
    assert curve
    # cumulative columns accumulate exactly down the quality ladder
    cd = ct = 0
    for r in curve:
        cd += r.n_docs
        ct += r.n_tokens
        assert (r.cum_docs, r.cum_tokens) == (cd, ct)
        assert r.score_lo_permille == r.bucket * 50
    # the full-corpus row covers everything
    assert curve[-1].cum_docs == docs.filter(F.col("n_chars").isNotNull()).count()


def test_matryoshka_recall_full_dim_is_perfect_and_monotonic_ish(spark):
    from shaclapi_spark.pipeline import similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 4)
    mr = sim.matryoshka_recall(
        emb, q, "vec_id", "embedding", "vec_id", "embedding",
        dims=[8, 64], full_dim=64, k=10,
    )
    rows = {(r.q_id, r.dim): r.overlap for r in mr.collect()}
    assert len(rows) == 8  # 4 queries x 2 dims, missing combos zero-filled
    for qid in range(4):
        assert rows[(qid, 64)] == 10  # full dim retrieves itself exactly
        assert 0 <= rows[(qid, 8)] <= 10
