"""Corpus n-gram statistics: top-k frequent spans + boilerplate scoring."""

import pytest
from pyspark.sql import Row, functions as F

from shaclapi_spark.pipeline import corpus


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id="d1", text="the cat sat on the mat"),
        Row(doc_id="d2", text="the cat sat on the hat"),
        Row(doc_id="d3", text="the cat sat quietly"),
        Row(doc_id="d4", text="a dog ran"),
        Row(doc_id="d5", text="The  Cat  sat on the mat the cat sat"),
        Row(doc_id="d6", text="solo"),  # < n words → zero grams
    ]
    return spark.createDataFrame(rows)


def test_top_ngrams_counts(spark, docs):
    top = corpus.top_ngrams(docs, "doc_id", "text", n=2, k=3).collect()
    # "the cat" occurs d1,d2,d3 once each, d5 twice (normalized) = 5 occ / 4 docs
    # "cat sat" the same; tie broken by ngram ASC → "cat sat" first
    assert (top[0].ngram, top[0].n_occurrences, top[0].n_docs) == ("cat sat", 5, 4)
    assert (top[1].ngram, top[1].n_occurrences, top[1].n_docs) == ("the cat", 5, 4)
    assert top[2].n_occurrences < 5


def test_top_ngrams_k_bounds(spark, docs):
    assert corpus.top_ngrams(docs, "doc_id", "text", n=2, k=1000).count() > 3
    assert corpus.top_ngrams(docs, "doc_id", "text", n=2, k=2).count() == 2


def test_boilerplate_score(spark, docs):
    scored = {
        r.doc_id: r
        for r in corpus.boilerplate_score(
            docs, "doc_id", "text", n=2, min_df=3
        ).collect()
    }
    assert len(scored) == 6
    # boilerplate set at min_df=3: "the cat", "cat sat" (df 4), "sat on",
    # "on the" (df 3)
    d1 = scored["d1"]  # grams: the cat, cat sat, sat on, on the, the mat
    assert (d1.n_grams, d1.n_boiler) == (5, 4)
    assert d1.boilerplate_frac == pytest.approx(0.8)
    d4 = scored["d4"]  # a dog, dog ran — none boilerplate
    assert (d4.n_grams, d4.n_boiler) == (2, 0)
    assert d4.boilerplate_frac == 0.0
    # sub-n doc: zero grams, NULL frac
    d6 = scored["d6"]
    assert (d6.n_grams, d6.n_boiler) == (0, 0)
    assert d6.boilerplate_frac is None
    # d5 distinct grams: the cat, cat sat, sat on, on the, the mat, mat the
    d5 = scored["d5"]
    assert (d5.n_grams, d5.n_boiler) == (6, 4)


def test_boilerplate_plan_broadcasts(spark, docs):
    plan = corpus.boilerplate_score(
        docs, "doc_id", "text", n=2, min_df=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan