"""Web-scrape cleaning signals: mojibake/encoding-artifact scoring,
URL/domain stats, and exact-substring (canary) contamination."""

import pytest
from pyspark.sql import Row, functions as F

from shaclapi_spark.pipeline import webclean as wc
from shaclapi_spark.pipeline.dedup import substring_contaminated


@pytest.fixture(scope="module")
def web_docs(spark):
    rows = [
        Row(id=0, text="clean prose, long enough to stay under any ratio gate " * 3),
        Row(id=1, text="bad decode Ã© and â€™ twice â€™ here"),
        Row(id=2, text="lost bytes �� and a bell \x07"),
        Row(id=3, text="see https://a.example.com/x and http://spam.bad/p?q=1 end"),
        Row(id=4, text="links https://a.example.com/y https://b.example.org/z"),
    ]
    return spark.createDataFrame(rows)


def test_artifact_counts(spark, web_docs):
    out = {r.id: r for r in wc.with_encoding_quality(web_docs).collect()}
    assert (out[0].n_mojibake, out[0].n_repl, out[0].n_ctrl) == (0, 0, 0)
    assert out[0].enc_ok
    assert out[1].n_mojibake == 3
    assert not out[1].enc_ok
    assert (out[2].n_repl, out[2].n_ctrl) == (2, 1)
    assert not out[2].enc_ok


def test_url_extraction_and_domains(spark, web_docs):
    urls = wc.extract_urls(web_docs, id_col="id").collect()
    assert sorted(u.domain for u in urls) == [
        "a.example.com",
        "a.example.com",
        "b.example.org",
        "spam.bad",
    ]
    stats = {r.domain: r for r in wc.domain_stats(web_docs, blocklist=("spam.bad",), id_col="id").collect()}
    assert stats["a.example.com"].n_urls == 2
    assert stats["a.example.com"].n_docs == 2
    assert stats["spam.bad"].blocked and not stats["a.example.com"].blocked
    bad = wc.blocked_docs(web_docs, ("spam.bad",), id_col="id").collect()
    assert [r.id for r in bad] == [3]


def test_substring_contaminated(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=1, text="unrelated content entirely"),
            Row(doc_id=2, text="quick brown fox AND lazy dog appear here"),
        ]
    )
    needles = spark.createDataFrame(
        [Row(needle="quick brown fox"), Row(needle="lazy dog"), Row(needle="absent")]
    )
    out = {r.doc_id: r.n_hits for r in substring_contaminated(docs, needles).collect()}
    assert out == {0: 2, 2: 2}


def test_substring_contaminated_plan_broadcast(spark):
    docs = spark.createDataFrame([Row(doc_id=0, text="x")])
    needles = spark.createDataFrame([Row(needle="x")])
    plan = substring_contaminated(docs, needles)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
