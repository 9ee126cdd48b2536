"""PII scrubbing, in-document line dedup, epoch-seeded global shuffle."""

import pytest
from pyspark.sql import Row, functions as F

from shaclapi_spark.pipeline import scrub
from shaclapi_spark.pipeline.sampling import epoch_shuffle, md5_60


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        Row(id=0, text="write bob.smith+a@mail.example.org or +1 555-867-5309"),
        Row(id=1, text="cards 4242 4242-4242 4242 and 1234-5678-9012-3456 ip 10.0.255.7"),
        Row(id=2, text="no pii here"),
        Row(id=3, text="a@b.io 192.168.1.1 and then 555 1234567"),
    ]
    return spark.createDataFrame(rows)


def test_redact_and_count(spark, pii_docs):
    out = {r.id: r for r in scrub.scrub(pii_docs, "text").collect()}
    assert out[0].text_redacted == "write <EMAIL> or <PHONE>"
    assert (out[0].n_email, out[0].n_phone) == (1, 1)
    # grouped card eats before the looser phone pattern; both cards caught
    assert out[1].text_redacted == "cards <CARD> and <CARD> ip <IP>"
    assert (out[1].n_card, out[1].n_phone, out[1].n_ipv4) == (2, 0, 1)
    assert out[2].text_redacted == "no pii here"
    assert sum([out[2].n_email, out[2].n_card, out[2].n_ipv4, out[2].n_phone]) == 0
    assert out[3].text_redacted == "<EMAIL> <IP> and then <PHONE>"


def test_line_dedup(spark):
    df = spark.createDataFrame(
        [Row(id=0, text="dup\nline\ndup\nother\nline"), Row(id=1, text="solo")]
    )
    out = {r.id: r for r in scrub.with_line_dedup(df, "text").collect()}
    assert out[0].text_deduped == "dup\nline\nother"
    assert out[0].n_dup_lines == 2
    assert out[1].text_deduped == "solo"
    assert out[1].n_dup_lines == 0


def test_epoch_shuffle_is_global_rank(spark):
    df = spark.range(200).select(F.col("id").cast("string").alias("doc_id"))
    out = epoch_shuffle(df, "doc_id", epoch=2, n_buckets=8)
    rows = out.orderBy("shuffle_rank").collect()
    assert [r.shuffle_rank for r in rows] == list(range(1, 201))
    ref = (
        df.withColumn(
            "k", md5_60(F.concat(F.lit("epoch2::"), F.col("doc_id")))
        )
        .orderBy("k", "doc_id")
        .collect()
    )
    assert [r.doc_id for r in rows] == [r.doc_id for r in ref]


def test_epoch_shuffle_epochs_differ(spark):
    df = spark.range(50).select(F.col("id").cast("string").alias("doc_id"))
    e0 = [r.doc_id for r in epoch_shuffle(df, "doc_id", 0).orderBy("shuffle_rank").collect()]
    e1 = [r.doc_id for r in epoch_shuffle(df, "doc_id", 1).orderBy("shuffle_rank").collect()]
    assert e0 != e1
    assert sorted(e0) == sorted(e1)


def test_epoch_shuffle_rejects_bad_buckets(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("doc_id"))
    with pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", n_buckets=12)


def test_epoch_shuffle_plan_has_no_global_window(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("doc_id"))
    plan = (
        epoch_shuffle(df, "doc_id", n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the window must partition by the bucket column, never run unpartitioned
    assert "partitionBy" not in plan or "__b" in plan
    assert "Window" in plan and "__b" in plan