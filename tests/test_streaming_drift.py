"""Windowed streaming PSI drift verdicts (streaming/drift.py): per-window
values equal ops.drift.ks_psi on the same counts; drifted flag fires on
the shifted window only."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import Row

from shaclapi_spark.ops.drift import ks_psi
from shaclapi_spark.streaming.drift import windowed_psi

BASE = dt.datetime(2026, 1, 1, 0, 0, 0)
N_BINS = 10
REF = [1.0 / N_BINS] * N_BINS  # uniform reference over [0, 100)


@pytest.fixture()
def src(spark, tmp_path):
    out = str(tmp_path / "vals")
    # hour 0: uniform over [0,100) → psi ~ 0
    h0 = [
        Row(ts=BASE + dt.timedelta(minutes=i % 60), v=float(i % 100))
        for i in range(400)
    ]
    # hour 1: everything in [90,100) → large psi
    h1 = [
        Row(ts=BASE + dt.timedelta(hours=1, minutes=i % 60), v=90.0 + i % 10)
        for i in range(400)
    ]
    # hour 3: a null-heavy trickle (nulls excluded) + closes hour 1's window
    h3 = [
        Row(ts=BASE + dt.timedelta(hours=3, minutes=i), v=None) for i in range(5)
    ] + [Row(ts=BASE + dt.timedelta(hours=3), v=50.0)]
    for batch in (h0, h1, h3):
        spark.createDataFrame(batch, "ts timestamp, v double").coalesce(1).write.mode(
            "append"
        ).parquet(out)
    return out


def test_windowed_psi_matches_batch_formula(spark, src):
    stream = (
        spark.readStream.schema("ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_psi(
            stream, "ts", "v", lo=0.0, hi=100.0, ref_fracs=REF, watermark="45 minutes"
        )
        .writeStream.format("memory")
        .queryName("psi_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r.window_start: r
        for r in spark.sql("SELECT * FROM psi_out").collect()
    }
    # hours 0 and 1 closed (final watermark 3:05 - 45min = 2:20 passed both
    # window ends; hour 3's own window stays open and must NOT appear)
    assert BASE in rows and BASE + dt.timedelta(hours=1) in rows
    r0, r1 = rows[BASE], rows[BASE + dt.timedelta(hours=1)]
    assert r0.n_rows == 400 and r1.n_rows == 400

    def expect_psi(values):
        counts = np.zeros(N_BINS)
        for v in values:
            counts[min(N_BINS - 1, max(0, int(v // 10)))] += 1
        _, psi = ks_psi(counts / counts.sum(), np.array(REF))
        return psi

    assert abs(r0.psi - expect_psi([i % 100 for i in range(400)])) < 1e-9
    assert abs(r1.psi - expect_psi([90 + i % 10 for i in range(400)])) < 1e-9
    assert not r0.drifted and r1.drifted

    # chi2 rides the same aggregate: matches the batch chi2_gof formula
    # (smoothed ref fractions, counts not fractions)
    import math as _math

    eps = 1e-6
    qsum = sum(REF) + N_BINS * eps
    q_sm = [(f + eps) / qsum for f in REF]

    def expect_chi2(values):
        counts = np.zeros(N_BINS)
        for v in values:
            counts[min(N_BINS - 1, max(0, int(v // 10)))] += 1
        n = counts.sum()
        return float(sum((counts[i] - n * q_sm[i]) ** 2 / (n * q_sm[i]) for i in range(N_BINS)))

    assert abs(r0.chi2 - expect_chi2([i % 100 for i in range(400)])) < 1e-6
    assert abs(r1.chi2 - expect_chi2([90 + i % 10 for i in range(400)])) < 1e-6
    assert r1.chi2 > r0.chi2


def test_validation(spark, src):
    stream = spark.readStream.schema("ts timestamp, v double").parquet(src)
    with pytest.raises(ValueError):
        windowed_psi(stream, "ts", "v", lo=0.0, hi=100.0, ref_fracs=[1.0])
    with pytest.raises(ValueError):
        windowed_psi(stream, "ts", "v", lo=5.0, hi=5.0, ref_fracs=REF)
