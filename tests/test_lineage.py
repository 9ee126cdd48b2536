"""Incremental waves + idempotent resume (north rule: checkpointed
per-partition lineage; interrupted runs resume without recomputation)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from shaclapi_spark import engine, fixtures, lineage


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "lineage_out")


def test_waves_cover_everything_once(spark, fixture_tables, out_dir):
    suite = fixtures.clip_suite(include_drift=False)
    run = lineage.run_with_lineage(
        spark, suite, fixture_tables, "ClipShape", out_dir, n_waves=4
    )
    assert run.ran == [0, 1, 2, 3]
    got = lineage.read_all(spark, out_dir, "verdicts").filter(
        F.col("shape") == "ClipShape"
    )
    ref = engine.run_suite(
        spark, suite, fixture_tables, target_shapes=["ClipShape"]
    ).verdicts.filter(F.col("shape") == "ClipShape")
    got_rows = {(r.entity_id, r.is_valid) for r in got.collect()}
    ref_rows = {(r.entity_id, r.is_valid) for r in ref.collect()}
    assert got_rows == ref_rows


def test_resume_skips_completed_waves(spark, fixture_tables, out_dir):
    suite = fixtures.clip_suite(include_drift=False, include_audio=False)
    # simulate an interrupted run: waves 0 and 2 already committed
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_manifest.jsonl"), "w") as fh:
        for w in (0, 2):
            fh.write(json.dumps({"wave": w, "status": "done"}) + "\n")
    run = lineage.run_with_lineage(
        spark, suite, fixture_tables, "ClipShape", out_dir, n_waves=4
    )
    assert run.ran == [1, 3]
    assert run.completed == [0, 1, 2, 3]
    # second resume: nothing left to do
    run2 = lineage.run_with_lineage(
        spark, suite, fixture_tables, "ClipShape", out_dir, n_waves=4
    )
    assert run2.ran == []


def test_cyclic_target_rejected(spark, fixture_tables, out_dir):
    with pytest.raises(ValueError, match="cyclic"):
        lineage.run_with_lineage(
            spark,
            fixtures.clip_cycle_suite(),
            fixture_tables,
            "ClipShape",
            out_dir,
            n_waves=2,
        )


def test_first_verdict_latency_recorded(spark, fixture_tables, tmp_path):
    from shaclapi_spark import fixtures
    from shaclapi_spark.lineage import run_with_lineage

    out = str(tmp_path / "lat")
    run = run_with_lineage(
        spark,
        fixtures.clip_suite(include_audio=False, include_drift=False),
        fixture_tables,
        "ClipShape",
        out,
        n_waves=4,
    )
    # first wave landed strictly before the full run finished
    assert run.first_verdict_sec is not None
    assert 0 < run.first_verdict_sec <= run.wall_sec
    # and it is persisted in the metrics table
    m = spark.read.parquet(out + "/metrics")
    rows = m.filter(m.stage == "first_verdict_sec").collect()
    assert len(rows) == 1 and rows[0].wall_sec == run.first_verdict_sec
    # per-answer trace parity: one emission row per wave, cumulative
    # answer counts strictly increasing, offsets nondecreasing
    tr = spark.read.parquet(out + "/trace").orderBy("time").collect()
    assert len(tr) == 4
    answers = [r.answer for r in tr]
    assert answers == sorted(answers) and answers[-1] == sum(r.n_rows for r in tr)
    assert all(r.n_rows > 0 for r in tr)
    # first trace row IS the first-result event (separate clock reads,
    # so equality only up to a few ms)
    assert abs(tr[0].time - run.first_verdict_sec) < 0.05
