"""Event-time windows + watermark and applyInPandasWithState entity counts
(streaming/windows.py). File-source streams driven with availableNow."""

import os

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from shaclapi_spark.streaming.windows import (
    streaming_entity_counts,
    windowed_event_counts,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("etype", StringType()),
        StructField("v", IntegerType()),
    ]
)


@pytest.fixture()
def event_src(spark, tmp_path):
    src = str(tmp_path / "events_src")
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 0, 0, 0)

    def rows_for(hours):
        rows = []
        for h in hours:
            for k in ("click", "view"):
                for i in range(h + 1):  # h+1 rows per (hour, etype)
                    rows.append(
                        Row(
                            ts=base + dt.timedelta(hours=h, minutes=i % 60),
                            etype=k,
                            v=i,
                        )
                    )
        return rows

    # two files → two micro-batches (maxFilesPerTrigger=1): the watermark
    # computed from file 1 closes its early windows during batch 2 — with a
    # single batch, append mode would terminate before any window closes
    for hours in (range(0, 3), range(3, 6)):
        spark.createDataFrame(rows_for(hours), EVENTS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(src)
    return src


def test_windowed_counts_match_batch_oracle(spark, event_src, tmp_path):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(event_src)
    )
    agg = windowed_event_counts(stream, ts_col="ts", key_col="etype")
    out = str(tmp_path / "win_out")
    ck = str(tmp_path / "win_ck")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.win_start, r.etype): r.n
        for r in spark.read.parquet(out).collect()
    }
    exp = {
        (r.ws, r.etype): r.n
        for r in (
            spark.read.parquet(event_src)
            .groupBy(F.window("ts", "1 hour").alias("w"), "etype")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "etype", "n")
        ).collect()
    }
    # append mode emits only windows the watermark has closed; every emitted
    # window must match the batch oracle, and the closed prefix is non-empty
    assert got
    assert all(exp[k] == v for k, v in got.items())


def test_stateful_entity_counts_accumulate_across_batches(spark, tmp_path):
    src = str(tmp_path / "tr_src")
    out = str(tmp_path / "tr_out")
    ck = str(tmp_path / "tr_ck")
    schema = StructType([StructField("clip_id", StringType())])

    def feed(rows):
        spark.createDataFrame([Row(clip_id=c) for c in rows], schema).coalesce(
            1
        ).write.mode("append").parquet(src)

    def run_pass():
        stream = spark.readStream.schema(schema).parquet(src)
        counts = streaming_entity_counts(
            stream, "clip_id", min_count=1, max_count=2
        )
        # parquet sinks reject update mode — append each batch's update rows
        # via foreachBatch (downstream consumers upsert on entity_id)
        q = (
            counts.writeStream.outputMode("update")
            .foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    feed(["a", "a", "b"])
    run_pass()
    first = {
        r.entity_id: (r.n_rows, r.min_status, r.max_status)
        for r in spark.read.parquet(out).collect()
    }
    assert first["a"] == (2, "satisfied", "ok_so_far")
    assert first["b"] == (1, "satisfied", "ok_so_far")

    # second batch: state persists via checkpoint; 'a' crosses max_count=2
    feed(["a", "c"])
    run_pass()
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:  # keep the max-count row per entity (monotone n_rows)
        cur = latest.get(r.entity_id)
        if cur is None or r.n_rows > cur[0]:
            latest[r.entity_id] = (r.n_rows, r.min_status, r.max_status)
    assert latest["a"] == (3, "satisfied", "violated")  # early-fail, mid-stream
    assert latest["b"] == (1, "satisfied", "ok_so_far")
    assert latest["c"] == (1, "satisfied", "ok_so_far")


def test_stateful_min_pending_until_reached(spark, tmp_path):
    src = str(tmp_path / "m_src")
    out = str(tmp_path / "m_out")
    ck = str(tmp_path / "m_ck")
    schema = StructType([StructField("clip_id", StringType())])
    spark.createDataFrame([Row(clip_id="x")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    counts = streaming_entity_counts(stream, "clip_id", min_count=3)
    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    [r] = spark.read.parquet(out).collect()
    # min violation is NOT emitted mid-stream — undecidable before EOF
    assert (r.entity_id, r.n_rows, r.min_status) == ("x", 1, "pending")


def test_streaming_dedup_first_wins_bounded_state(spark, tmp_path):
    import datetime as dt

    from shaclapi_spark.streaming.windows import streaming_dedup

    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("clip_id", StringType()),
            StructField("v", IntegerType()),
        ]
    )
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "dedup_src")
    # batch 1: ids a,b (a twice within the batch); batch 2: a,b again within
    # the watermark horizon plus a fresh id c
    b1 = [
        Row(ts=base, clip_id="a", v=1),
        Row(ts=base + dt.timedelta(minutes=1), clip_id="a", v=2),
        Row(ts=base + dt.timedelta(minutes=2), clip_id="b", v=3),
    ]
    b2 = [
        Row(ts=base + dt.timedelta(minutes=30), clip_id="a", v=4),
        Row(ts=base + dt.timedelta(minutes=31), clip_id="b", v=5),
        Row(ts=base + dt.timedelta(minutes=32), clip_id="c", v=6),
    ]
    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = str(tmp_path / "dedup_out")
    q = (
        streaming_dedup(stream, "clip_id", "ts", watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.clip_id: r.v for r in spark.read.parquet(out).collect()}
    # exactly one survivor per id, and it is the FIRST occurrence
    assert got == {"a": 1, "b": 3, "c": 6}


def test_streaming_sessions_match_batch_sessionize(spark, tmp_path):
    """Live session_window sessions agree with the batch gaps-and-islands
    backfill (pipeline/sessions.py) on session count and sizes per user —
    the live/backfill parity claim in streaming_sessions' docstring."""
    import datetime as dt

    from shaclapi_spark.pipeline import sessions as sess
    from shaclapi_spark.streaming.windows import streaming_sessions

    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", StringType()),
            StructField("event_id", IntegerType()),
        ]
    )
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # u1: two sessions (burst at 0-10 min, burst at 2h); u2: one session
    for m in (0, 5, 10, 120, 125):
        rows.append(Row(ts=base + dt.timedelta(minutes=m), user_id="u1", event_id=eid))
        eid += 1
    for m in (7, 20):
        rows.append(Row(ts=base + dt.timedelta(minutes=m), user_id="u2", event_id=eid))
        eid += 1
    src = str(tmp_path / "sess_src")
    # two files → the second batch's far-future rows advance the watermark
    # past the first sessions' close so append mode emits them
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    flush = [Row(ts=base + dt.timedelta(hours=12), user_id="zz", event_id=999)]
    spark.createDataFrame(flush, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = str(tmp_path / "sess_out")
    q = (
        streaming_sessions(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.read.parquet(out).collect()
        if r.user_id != "zz"
    }
    batch = {
        (r.user_id, r.session_idx): r.n_events
        for r in sess.session_rollup(
            spark.read.parquet(src).where("user_id <> 'zz'"),
            gap_minutes=30,
        ).collect()
    }
    # same session multiset per user: u1 → {3, 2}, u2 → {2}
    assert sorted(v for (u, _), v in live.items() if u == "u1") == [2, 3]
    assert sorted(v for (u, _), v in live.items() if u == "u2") == [2]
    assert sorted(batch.values()) == sorted(live.values())
