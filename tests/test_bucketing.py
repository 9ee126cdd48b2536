"""Bucketed-layout tests: the whole point of bucketing.py is that suite-hot
joins and groupBys ride the stored HashPartitioning with NO exchange, so the
assertions here are plan-shape ones (Exchange counts), not just results."""

import pytest
from pyspark.sql import Row, functions as F

from shaclapi_spark import bucketing, fixtures
from shaclapi_spark.suite import Constraint, Shape, Suite


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucket_keys_derive_from_suite():
    keys = bucketing.bucket_keys_for(fixtures.clip_suite())
    # clips: entity col; transcripts: the child fk hammered by
    # min_count/max_count/qualified_shape plus its own entity groupBy.
    assert keys["clips"] == "clip_id"
    assert keys["transcripts"] == "clip_id"


def test_bucket_keys_fk_votes_parent_key():
    s = Suite(
        shapes=[
            Shape(
                name="A",
                table="a",
                entity_col="a_id",
                constraints=[
                    Constraint(
                        "fk", "fk_exists",
                        {"column": "b_ref", "parent": "b", "parent_col": "b_id"},
                    )
                ],
            )
        ]
    )
    keys = bucketing.bucket_keys_for(s)
    assert keys["b"] == "b_id"
    # entity col out-votes the single fk vote on the home table
    assert keys["a"] == "a_id"


@pytest.fixture(scope="module")
def bucketed(spark):
    clips = spark.createDataFrame(
        [Row(clip_id=f"c{i:04d}", sr_hz=16000, dur_ms=1000 + i) for i in range(400)]
    )
    transcripts = spark.createDataFrame(
        [Row(clip_id=f"c{i:04d}", transcript=f"t{i}", n_tokens=i % 7) for i in range(380)]
    )
    suite = fixtures.clip_suite(include_audio=False, include_drift=False)
    out = bucketing.bucket_tables(
        spark, {"clips": clips, "transcripts": transcripts}, suite, n_buckets=4
    )
    yield out
    for t in ("b_clips", "b_transcripts"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    plan = _plan(bucketed["transcripts"].groupBy("clip_id").count())
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_has_no_exchange(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed["clips"].join(bucketed["transcripts"], "clip_id")
        plan = _plan(j)
        assert "Exchange" not in plan
        # sortBy(key) in the layout spares the SMJ sort too
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_results_match_unbucketed(spark, bucketed):
    got = (
        bucketed["clips"]
        .join(bucketed["transcripts"], "clip_id")
        .groupBy("clip_id")
        .agg(F.count("*").alias("n"))
    )
    assert got.count() == 380
    assert got.agg(F.sum("n")).collect()[0][0] == 380


def test_orphaned_warehouse_dir_is_cleared(spark, tmp_path):
    # Simulate a previous session's leftover: the managed location exists
    # on disk but the table is absent from this session's catalog.
    import os
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    local = warehouse.removeprefix("file:")
    orphan = os.path.join(local, "b_orphan")
    spark.sql("DROP TABLE IF EXISTS b_orphan")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "leftover"), "w") as f:
        f.write("x")
    df = spark.createDataFrame([Row(clip_id=f"c{i}", x=i) for i in range(20)])
    try:
        bucketing.write_bucketed(df, "b_orphan", ["clip_id"], 2)
        assert spark.table("b_orphan").count() == 20
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orphan")


def test_unknown_table_passes_through(spark, bucketed):
    extra = spark.createDataFrame([Row(x=1)])
    suite = fixtures.clip_suite(include_audio=False, include_drift=False)
    out = bucketing.bucket_tables(spark, {"events": extra}, suite, n_buckets=4)
    assert out["events"] is extra
