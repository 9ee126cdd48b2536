"""Stream-stream point-in-interval join (streaming/joins.py): output
equals the batch inequality join; state-cleanup bound truncates
over-long intervals as documented."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from shaclapi_spark.streaming.joins import stream_interval_join

BASE = dt.datetime(2026, 1, 1, 0, 0, 0)

POINTS_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("ts", TimestampType()),
    ]
)
IV_SCHEMA = StructType(
    [
        StructField("incident_id", StringType()),
        StructField("start", TimestampType()),
        StructField("end", TimestampType()),
    ]
)


def _m(minutes):
    return BASE + dt.timedelta(minutes=minutes)


@pytest.fixture()
def sources(spark, tmp_path):
    psrc, isrc = str(tmp_path / "pts"), str(tmp_path / "ivs")
    points = [
        Row(event_id=f"p{m}", ts=_m(m))
        for m in (1, 5, 12, 18, 25, 33, 47, 55, 61, 70)
    ]
    intervals = [
        Row(incident_id="i1", start=_m(0), end=_m(10)),  # catches p1,p5
        Row(incident_id="i2", start=_m(15), end=_m(30)),  # p18,p25
        Row(incident_id="i3", start=_m(24), end=_m(35)),  # p25,p33 (overlap)
        Row(incident_id="i4", start=_m(50), end=_m(52)),  # nothing
        Row(incident_id="i5", start=_m(58), end=_m(75)),  # p61,p70
    ]
    # two files per side → multiple micro-batches under maxFilesPerTrigger
    for batch in (points[:5], points[5:]):
        spark.createDataFrame(batch, POINTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(psrc)
    for batch in (intervals[:3], intervals[3:]):
        spark.createDataFrame(batch, IV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(isrc)
    return psrc, isrc, points, intervals


def _run(spark, psrc, isrc, **kw):
    p = (
        spark.readStream.schema(POINTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(psrc)
    )
    i = (
        spark.readStream.schema(IV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(isrc)
    )
    out = stream_interval_join(p, i, "ts", "start", "end", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName("sij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("SELECT event_id, incident_id FROM sij_out").collect()


def test_matches_batch_inequality_join(spark, sources):
    psrc, isrc, points, intervals = sources
    got = sorted((r.event_id, r.incident_id) for r in _run(spark, psrc, isrc))
    expect = sorted(
        (p.event_id, i.incident_id)
        for p in points
        for i in intervals
        if i.start <= p.ts <= i.end
    )
    assert got == expect
    # sanity on the fixture: overlapping intervals emit one row each
    assert ("p25", "i2") in got and ("p25", "i3") in got


def test_max_interval_truncates_long_intervals(spark, sources):
    psrc, isrc, points, intervals = sources
    got = sorted(
        (r.event_id, r.incident_id)
        for r in _run(spark, psrc, isrc, max_interval="10 minutes")
    )
    expect = sorted(
        (p.event_id, i.incident_id)
        for p in points
        for i in intervals
        if i.start <= p.ts <= min(i.end, i.start + dt.timedelta(minutes=10))
    )
    assert got == expect
    # i5 spans 17 min: p70 is beyond start+10min and must be dropped
    assert ("p61", "i5") in got and ("p70", "i5") not in got


def test_column_clash_raises(spark, sources):
    psrc, isrc, *_ = sources
    p = spark.readStream.schema(POINTS_SCHEMA).parquet(psrc)
    i = (
        spark.readStream.schema(IV_SCHEMA)
        .parquet(isrc)
        .withColumnRenamed("incident_id", "event_id")
    )
    with pytest.raises(ValueError, match="collision"):
        stream_interval_join(p, i, "ts", "start", "end")
