"""Query-driven target-set restriction — the batch analog of the reference's
replace_target_query flow (ref shaclapi/reduction/Reduction.py:25-64,
shaclapi/query.py:194-244 Query.intersect, per-shape query extensions
config.py:326-331): validation restricted to the entities the caller's
query names, with the restriction propagated to referenced helper shapes.
"""

from pyspark.sql import functions as F

from shaclapi_spark import engine, fixtures


def _verdict_map(verdicts, shape):
    return {
        r.entity_id: r.is_valid
        for r in verdicts.filter(F.col("shape") == shape).collect()
    }


def test_str_population_restricts_and_matches_full_run(spark, fixture_tables):
    suite = fixtures.clip_suite(include_audio=False, include_drift=False)
    full = engine.run_suite(spark, suite, fixture_tables)
    restricted = engine.run_suite(
        spark,
        suite,
        fixture_tables,
        target_shapes=["ClipShape"],
        target_population="codec = 'flac'",
    )
    flac_ids = {
        r.clip_id
        for r in fixture_tables["clips"]
        .filter(F.col("codec") == "flac")
        .select("clip_id")
        .distinct()
        .collect()
    }
    got = _verdict_map(restricted.verdicts, "ClipShape")
    exp = {
        k: v for k, v in _verdict_map(full.verdicts, "ClipShape").items() if k in flac_ids
    }
    assert set(got) == flac_ids
    assert got == exp


def test_population_propagates_to_helper_shape(spark, fixture_tables):
    suite = fixtures.clip_suite(include_audio=False, include_drift=False)
    restricted = engine.run_suite(
        spark,
        suite,
        fixture_tables,
        target_shapes=["ClipShape"],
        target_population="codec = 'flac'",
    )
    # the helper's verdicts cover exactly the transcripts of restricted clips
    flac = fixture_tables["clips"].filter(F.col("codec") == "flac")
    expected_tr = {
        r.transcript_id
        for r in fixture_tables["transcripts"]
        .join(flac.select("clip_id").distinct(), "clip_id", "leftsemi")
        .select("transcript_id")
        .collect()
    }
    got_tr = set(_verdict_map(restricted.verdicts, "TranscriptShape"))
    assert got_tr == expected_tr
    # and their values agree with the unrestricted helper evaluation
    full = engine.run_suite(spark, suite, fixture_tables)
    full_tr = _verdict_map(full.verdicts, "TranscriptShape")
    assert _verdict_map(restricted.verdicts, "TranscriptShape") == {
        k: full_tr[k] for k in got_tr
    }


def test_dataframe_population(spark, fixture_tables):
    suite = fixtures.clip_suite(include_audio=False, include_drift=False)
    ids = [f"clip_{i:08d}" for i in (0, 1, 2, 89, 997)]
    pop = spark.createDataFrame([(i,) for i in ids], ["clip_id"])
    res = engine.run_suite(
        spark,
        suite,
        fixture_tables,
        target_shapes=["ClipShape"],
        target_population=pop,
    )
    got = _verdict_map(res.verdicts, "ClipShape")
    assert set(got) == set(ids)
    # i=89 seeds sr_hz=0 (range violation); i=997 is the duplicated clip
    assert got["clip_00000089"] is False
    assert got["clip_00000997"] is False


def test_population_on_cyclic_suite_post_filters_output(spark, fixture_tables):
    # cyclic groups evaluate unrestricted (fixpoint feedback), but the output
    # must still contain only the requested population
    suite = fixtures.clip_cycle_suite()
    full = engine.run_suite(
        spark, suite, fixture_tables, target_shapes=["ClipShape"]
    )
    restricted = engine.run_suite(
        spark,
        suite,
        fixture_tables,
        target_shapes=["ClipShape"],
        target_population="codec = 'flac'",
    )
    flac_ids = {
        r.clip_id
        for r in fixture_tables["clips"]
        .filter(F.col("codec") == "flac")
        .select("clip_id")
        .distinct()
        .collect()
    }
    got = _verdict_map(restricted.verdicts, "ClipShape")
    exp = {
        k: v for k, v in _verdict_map(full.verdicts, "ClipShape").items() if k in flac_ids
    }
    assert got == exp


def test_empty_population_returns_empty_sets(spark, fixture_tables):
    # border case analog: no_instances_at_all.json — zero matching targets
    # must produce empty result sets without error
    suite = fixtures.clip_suite(include_audio=False, include_drift=False)
    res = engine.run_suite(
        spark,
        suite,
        fixture_tables,
        target_shapes=["ClipShape"],
        target_population="codec = 'no_such_codec'",
    )
    assert res.verdicts.filter(F.col("shape") == "ClipShape").count() == 0
    assert res.violations.filter(F.col("shape") == "ClipShape").count() == 0
