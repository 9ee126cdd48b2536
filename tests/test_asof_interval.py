"""Correctness tests for the temporal joins (pipeline/asof.py,
pipeline/interval.py) and the exact-rational TF-IDF ranking
(corpus.distinctive_terms)."""

import pytest
from pyspark.sql import Row, functions as F

from shaclapi_spark.pipeline import asof, corpus, interval


def _sides(spark):
    left = spark.createDataFrame(
        [
            Row(pid=1, k="a", us=100),
            Row(pid=2, k="a", us=250),
            Row(pid=3, k="a", us=50),   # before any right row
            Row(pid=4, k="b", us=100),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(vid=10, k="a", us=80),
            Row(vid=11, k="a", us=100),  # tie with pid=1 → inclusive match
            Row(vid=12, k="a", us=200),
        ]
    )
    return left, right


def test_asof_inclusive_most_recent(spark):
    left, right = _sides(spark)
    out = {
        r.pid: (r.r_vid, r.r_ts, r.asof_gap)
        for r in asof.asof_join(left, right, "k", "us", ["vid"]).collect()
    }
    assert out[1] == (11, 100, 0)      # tie matches (<=), latest tie wins
    assert out[2] == (12, 200, 50)     # most recent prior
    assert out[3] == (None, None, None)  # nothing at-or-before
    assert out[4] == (None, None, None)  # key absent on the right


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _sides(spark)
    out = {
        r.pid: r.r_vid
        for r in asof.asof_join(
            left, right, "k", "us", ["vid"], tolerance_us=40
        ).collect()
    }
    assert out[2] == None  # noqa: E711 — gap 50 > 40 → discarded
    assert out[1] == 11    # gap 0 kept


def test_asof_rejects_key_in_right_cols(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError):
        asof.asof_join(left, right, "k", "us", ["k", "vid"])


def _intervals(spark):
    points = spark.createDataFrame(
        [
            Row(pid=1, us=150),
            Row(pid=2, us=999),   # in no interval
            Row(pid=3, us=100),   # exactly at a start bound
            Row(pid=4, us=5_000),  # inside a multi-bucket interval
        ]
    )
    iv = spark.createDataFrame(
        [
            Row(iid=1, s=100, e=200),
            Row(iid=2, s=120, e=160),     # overlaps iid=1 → pid=1 matches both
            Row(iid=3, s=1_000, e=9_000),  # spans many buckets (bucket=1000)
        ]
    )
    return points, iv


def test_interval_join_containment_and_overlap(spark):
    points, iv = _intervals(spark)
    rows = interval.interval_join(
        points, iv, "us", "s", "e", bucket_us=1000
    ).collect()
    got = sorted((r.pid, r.iid) for r in rows)
    # pid=1 in two overlapping intervals; bounds inclusive; pid=4 found
    # exactly ONCE even though iid=3 spans 9 buckets
    assert got == [(1, 1), (1, 2), (3, 1), (4, 3)]


def test_interval_join_left_keeps_unmatched(spark):
    points, iv = _intervals(spark)
    rows = interval.interval_join(
        points, iv, "us", "s", "e", bucket_us=1000, how="left"
    ).collect()
    unmatched = [r for r in rows if r.pid == 2]
    assert len(unmatched) == 1 and unmatched[0].iid is None


def test_interval_join_rejects_collisions_and_bad_args(spark):
    points, iv = _intervals(spark)
    with pytest.raises(ValueError):
        interval.interval_join(
            points, iv.withColumnRenamed("iid", "pid"), "us", "s", "e"
        )
    with pytest.raises(ValueError):
        interval.interval_join(points, iv, "us", "s", "e", bucket_us=0)
    with pytest.raises(ValueError):
        interval.interval_join(points, iv, "us", "s", "e", how="outer")


def test_distinctive_terms_exact_scores(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id="d1", text="apple apple banana"),
            Row(doc_id="d2", text="banana banana banana cherry cherry"),
            Row(doc_id="d3", text="banana"),
        ]
    )
    out = {
        (r.doc_id, r.term): (r.tf, r.df, r.score, r.rank)
        for r in corpus.distinctive_terms(docs, k=2, min_tf=2).collect()
    }
    # N=3 docs; df counts only (doc,term) rows surviving min_tf=2
    # d1: apple tf=2 df=1 → score 2*(3/1)=6.0
    assert out[("d1", "apple")] == (2, 1, 6.0, 1)
    # d2: cherry tf=2 df=1 → 6.0 ; banana tf=3 df=1 → 9.0 ranks 1
    assert out[("d2", "banana")] == (3, 1, 9.0, 1)
    assert out[("d2", "cherry")] == (2, 1, 6.0, 2)
    # d3's only term has tf=1 < min_tf → no rows for d3
    assert not any(k[0] == "d3" for k in out)
