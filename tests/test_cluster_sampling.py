"""Connected-components dedup clustering + deterministic sampling."""

import duckdb
import pytest
from pyspark.sql import functions as F

from shaclapi_spark.pipeline import cluster, dedup, sampling

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("edge_limit", [2_000_000, 0])
def test_connected_components_chain_and_star(spark, edge_limit):
    # component {1,2,3,4} (chain — needs >1 propagation round),
    # component {10,11,12} (star), pair (20,21) isolated;
    # edge_limit=0 forces the distributed label-propagation path,
    # the default takes the driver union-find fast path
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)],
        "a long, b long",
    )
    got = {
        r.node: r.component
        for r in cluster.connected_components(
            pairs, driver_edge_limit=edge_limit
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


@pytest.mark.parametrize("edge_limit", [2_000_000, 0])
def test_connected_components_long_chain(spark, edge_limit):
    # diameter 12: exercises multi-round convergence + lineage checkpointing
    # (distributed path) and deep find chains (driver path)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long"
    )
    got = cluster.connected_components(pairs, driver_edge_limit=edge_limit)
    assert {r.component for r in got.collect()} == {0}
    assert got.count() == 13


def test_connected_components_paths_agree_on_fixture_pairs(spark, docs):
    # both code paths produce the identical relation on a real pair graph
    d120 = docs.filter(F.col("doc_id") < 120)
    pairs = dedup.jaccard_pairs(d120, "doc_id", "text", k=5, threshold=0.2)
    fast = set(map(tuple, cluster.connected_components(pairs).collect()))
    dist = set(
        map(
            tuple,
            cluster.connected_components(pairs, driver_edge_limit=0).collect(),
        )
    )
    assert fast == dist and fast


def test_dedup_clusters_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "a long, b long"
    )
    got = {
        r.doc: (r.cluster_rep, r.cluster_size)
        for r in cluster.dedup_clusters(pairs).collect()
    }
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        7: (7, 2), 8: (7, 2),
    }


def test_dedup_survivors_anti_join(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "a long, b long")
    kept = sorted(r.doc_id for r in cluster.dedup_survivors(df, pairs, "doc_id").collect())
    # clusters {0,1,2} → keep 0; {4,5} → keep 4; 3 untouched
    assert kept == [0, 3, 4]


def test_cluster_of_real_jaccard_pairs(spark, docs):
    # every clustered doc appears in some pair, rep is min of its cluster,
    # and every pair's endpoints land in the same component
    d = docs.filter(F.col("doc_id") < 120)
    pairs = dedup.jaccard_pairs(d, "doc_id", "text", k=5, threshold=0.2)
    cl = cluster.dedup_clusters(pairs)
    rows = cl.collect()
    by_doc = {r.doc: r.cluster_rep for r in rows}
    for p in pairs.collect():
        assert by_doc[p.a] == by_doc[p.b]
    reps = {}
    for r in rows:
        reps.setdefault(r.cluster_rep, []).append(r.doc)
    for rep, members in reps.items():
        assert rep == min(members)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_hash_sample_matches_duckdb(spark, docs):
    got = sorted(
        r.doc_id
        for r in sampling.hash_sample(docs, "doc_id", rate=0.3).collect()
    )
    cut = int(0.3 * (1 << 60))
    con = duckdb.connect()
    exp = sorted(
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM read_parquet(?) WHERE "
            "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
            f" < {cut}",
            [f"{SF}/documents.parquet"],
        ).fetchall()
    )
    assert got == exp
    assert 0 < len(got) < docs.count()


def test_hash_sample_strata_rates(spark, docs):
    out = sampling.hash_sample(
        docs, "doc_id", rate=0.0, strata_col="lang", strata_rates={"en": 1.0}
    )
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # rate 1.0 keeps every en row


def test_hash_sample_salt_decorrelates(spark, docs):
    a = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", rate=0.5).collect()}
    b = {
        r.doc_id
        for r in sampling.hash_sample(docs, "doc_id", rate=0.5, salt="eval/").collect()
    }
    assert a != b  # different salts draw different subsets


def test_stratified_quota_exact_counts(spark, docs):
    out = sampling.stratified_quota(docs, "doc_id", "lang", quota=5)
    counts = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    full = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {lang: min(5, n) for lang, n in full.items()}


def test_stratified_quota_prefilter_identical_when_headroom(spark, docs):
    base = {
        r.doc_id
        for r in sampling.stratified_quota(docs, "doc_id", "lang", quota=3).collect()
    }
    pre = {
        r.doc_id
        for r in sampling.stratified_quota(
            docs, "doc_id", "lang", quota=3, prefilter_rate=0.9
        ).collect()
    }
    assert base == pre


def test_pack_sequences_deterministic_and_contiguous(spark):
    from pyspark.sql import Row
    from shaclapi_spark.pipeline import sampling as sp

    rows = [Row(doc_id=i, n_tok=10 + (i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows)
    out = sp.pack_sequences(df, "doc_id", "n_tok", capacity=64, n_shards=4)
    a = sorted(out.collect(), key=lambda r: r.doc_id)
    b = sorted(
        sp.pack_sequences(df, "doc_id", "n_tok", capacity=64, n_shards=4).collect(),
        key=lambda r: r.doc_id,
    )
    assert a == b  # pure function of the corpus
    # within a shard: offsets are cumsum mod capacity, bins never skip
    import collections

    by_shard = collections.defaultdict(list)
    for r in a:
        by_shard[r.shard].append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows_ in by_shard.values():
        seqs = sorted({r.seq_in_shard for r in rows_})
        assert seqs == list(range(len(seqs)))  # contiguous bin ids from 0
        total = sum(r.n_tokens for r in rows_)
        last = max(rows_, key=lambda r: (r.seq_in_shard, r.offset))
        assert last.seq_in_shard == (total - last.n_tokens) // 64


def test_pack_sequences_single_exchange(spark):
    from pyspark.sql import Row
    from shaclapi_spark.pipeline import sampling as sp

    df = spark.createDataFrame([Row(doc_id=i, n_tok=7) for i in range(50)])
    plan = sp.pack_sequences(df, "doc_id", "n_tok", capacity=64)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one shard partition, no global sort


def test_weighted_mix_epoch_semantics(spark):
    from pyspark.sql import Row
    from shaclapi_spark.pipeline import sampling as sp

    rows = [Row(doc_id=i, src="a" if i < 100 else "b") for i in range(200)]
    df = spark.createDataFrame(rows)
    out = sp.weighted_mix(
        df, "doc_id", weight=1.0, strata_col="src", strata_weights={"a": 2.5, "b": 0.0}
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.copy)
    # b dropped entirely; every a-doc appears 2 or 3 times with copy 0..k-1
    assert all(i < 100 for i in got)
    assert len(got) == 100
    counts = {i: sorted(c) for i, c in got.items()}
    assert all(c in ([0, 1], [0, 1, 2]) for c in counts.values())
    n3 = sum(1 for c in counts.values() if len(c) == 3)
    assert 30 <= n3 <= 70  # ~half get the fractional 3rd epoch
    # deterministic on rerun
    again = sp.weighted_mix(
        df, "doc_id", weight=1.0, strata_col="src", strata_weights={"a": 2.5, "b": 0.0}
    ).collect()
    assert sorted((r.doc_id, r.copy) for r in again) == sorted(
        (r.doc_id, r.copy) for r in out
    )


def test_weighted_mix_shuffle_free(spark):
    from pyspark.sql import Row
    from shaclapi_spark.pipeline import sampling as sp

    df = spark.createDataFrame([Row(doc_id=i) for i in range(10)])
    plan = (
        sp.weighted_mix(df, "doc_id", weight=1.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure scan-side generator


def test_packed_batch_stats_matches_pack_sequences(spark):
    from pyspark.sql import Row
    from shaclapi_spark.pipeline import sampling as sp

    rows = [Row(doc_id=i, n_tok=10 + (i % 5), extra=i % 3) for i in range(200)]
    df = spark.createDataFrame(rows)
    stats = sp.packed_batch_stats(
        df, "doc_id", "n_tok", capacity=64, n_shards=4, sum_cols=("extra",)
    ).collect()
    assign = sp.pack_sequences(df, "doc_id", "n_tok", capacity=64, n_shards=4).collect()
    extra_by_id = {r.doc_id: r.extra for r in rows}
    manual: dict = {}
    for r in assign:
        key = (r.shard, r.seq_in_shard)
        n, w, e = manual.get(key, (0, 0, 0))
        manual[key] = (n + 1, w + r.n_tokens, e + extra_by_id[r.doc_id])
    got = {(r.shard, r.seq_in_shard): (r.n_items, r.total_weight, r.sum_extra) for r in stats}
    assert got == manual
    # every batch except possibly each shard's last is filled to >= capacity
    # minus the largest item (14): the running-sum rule leaves no gap bigger
    # than one straddling item
    last = {s: max(q for (sh, q) in got if sh == s) for s in {s for (s, _) in got}}
    for (s, q), (_, w, _) in got.items():
        if q != last[s]:
            assert w >= 64 - 14


def test_packed_batch_stats_two_exchanges_max(spark):
    from pyspark.sql import Row
    from shaclapi_spark.pipeline import sampling as sp

    rows = [Row(doc_id=i, n_tok=10) for i in range(50)]
    df = spark.createDataFrame(rows)
    plan = (
        sp.packed_batch_stats(df, "doc_id", "n_tok", capacity=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange for the shard window + one batch-grain rollup exchange
    assert plan.count("Exchange") <= 2


def test_length_bucket_padding(spark):
    from pyspark.sql import Row
    from shaclapi_spark.pipeline import sampling as sp

    rows = [
        Row(i="a", n=100),   # bucket 0 (<=200), pad 100
        Row(i="b", n=200),   # bucket 0 exactly, pad 0
        Row(i="c", n=201),   # bucket 1 (<=500), pad 299
        Row(i="d", n=900),   # overflow, padded to observed max 1000
        Row(i="e", n=1000),  # overflow max
        Row(i="f", n=None),  # excluded
    ]
    out = {
        r.bucket_idx: r
        for r in sp.length_bucket_padding(
            spark.createDataFrame(rows), "n", [200, 500]
        ).collect()
    }
    assert (out[0].bucket_max, out[0].n_rows, out[0].sum_len, out[0].pad_waste) == (200, 2, 300, 100)
    assert (out[1].bucket_max, out[1].n_rows, out[1].pad_waste) == (500, 1, 299)
    assert (out[2].bucket_max, out[2].n_rows, out[2].sum_len) == (1000, 2, 1900)
    assert out[2].pad_waste == 100
    assert len(out) == 3


def test_length_bucket_padding_validates_bounds(spark):
    from shaclapi_spark.pipeline import sampling as sp

    with pytest.raises(ValueError):
        sp.length_bucket_padding(spark.range(1), "id", [])
    with pytest.raises(ValueError):
        sp.length_bucket_padding(spark.range(1), "id", [0, 10])


def test_survivors_by_precedence(spark):
    df = spark.createDataFrame(
        [
            (0, "crawl"), (1, "books"), (2, "crawl"),   # cluster {0,1,2}
            (3, "crawl"),                               # pair-free
            (4, "crawl"), (5, "crawl"),                 # cluster {4,5}: tie -> min id
        ],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "a long, b long")
    prio = F.when(F.col("source") == "books", 0).otherwise(1)
    kept = sorted(
        r.doc_id
        for r in cluster.survivors_by_precedence(df, pairs, "doc_id", prio).collect()
    )
    # books beats crawl in {0,1,2} -> keep 1 (not min id 0); tie in {4,5} -> 4
    assert kept == [1, 3, 4]


def test_survivors_by_precedence_defaults_to_min_id(spark):
    df = spark.createDataFrame(
        [(i, "s") for i in range(6)], "doc_id long, source string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "a long, b long")
    const = F.lit(0)
    kept = sorted(
        r.doc_id
        for r in cluster.survivors_by_precedence(df, pairs, "doc_id", const).collect()
    )
    assert kept == [0, 3, 4]  # identical to dedup_survivors


def test_interleave_sources_proportions_and_determinism(spark):
    rows = [(i, "big" if i % 4 else "small") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.interleave_sources(
        df, "doc_id", "source", weights={"big": 3, "small": 1}
    )
    ordered = [
        r["source"]
        for r in out.orderBy("interleave_key", "source", "doc_id").collect()
    ]
    # in any prefix, big ≈ 3× small (within one step of the rational rate)
    for cut in (40, 100, 200, 400):
        prefix = ordered[:cut]
        nb, ns = prefix.count("big"), prefix.count("small")
        assert abs(nb - 3 * ns) <= 4, (cut, nb, ns)
    # deterministic across invocations
    again = [
        r["source"]
        for r in sampling.interleave_sources(
            df, "doc_id", "source", weights={"big": 3, "small": 1}
        ).orderBy("interleave_key", "source", "doc_id").collect()
    ]
    assert ordered == again


def test_interleave_key_exact_formula(spark):
    import hashlib as _h

    df = spark.createDataFrame(
        [(i, "a" if i < 6 else "b") for i in range(10)],
        "doc_id long, source string",
    )
    out = {
        r["doc_id"]: r["interleave_key"]
        for r in sampling.interleave_sources(
            df, "doc_id", "source", weights={"a": 2}
        ).collect()
    }
    # independent recomputation: rank within source by (md5_60, id); L=2
    def key(i):
        return int(_h.md5(f"interleave::{i}".encode()).hexdigest()[:15], 16)

    for src, members, step in (("a", range(6), 1), ("b", range(6, 10), 2)):
        ranked = sorted(members, key=lambda i: (key(i), i))
        for rnk, i in enumerate(ranked, start=1):
            assert out[i] == rnk * step, (src, i)


def test_interleave_sources_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        sampling.interleave_sources(df, "doc_id", "source", weights={"a": 0})
    with pytest.raises(ValueError):
        sampling.interleave_sources(df, "doc_id", "source", n_buckets=3)


def test_connected_components_byte_gate_routes_distributed(spark):
    # ids long enough that the byte gate trips even though the edge count
    # is tiny — must still produce the identical relation via the
    # distributed label-propagation path
    pairs = spark.createDataFrame(
        [("doc_" + "x" * 50 + str(i), "doc_" + "x" * 50 + str(i + 1))
         for i in range(4)],
        "a string, b string",
    )
    default = cluster.connected_components(pairs).orderBy("node").collect()
    gated = cluster.connected_components(
        pairs, driver_byte_limit=10
    ).orderBy("node").collect()
    assert default == gated
    assert len({r["component"] for r in gated}) == 1
