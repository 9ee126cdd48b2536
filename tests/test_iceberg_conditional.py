"""Conditional Iceberg-catalog battery (round-4 verdict what's-missing #2,
same pattern as tests/test_real_codecs.py).

This sandbox ships no iceberg-spark-runtime jar, so every test here SKIPS
— but in an environment where the jar is on the classpath and a catalog is
configured (spark-submit --packages org.apache.iceberg:iceberg-spark-
runtime-…), the gated `iceberg:` ref path in sources.read_table stops
being dead code: these tests create a real Iceberg table, run the clip
suite over it, and exercise snapshot time travel — the production path
BASELINE.json names.
"""

import pytest


def _iceberg_spark():
    """A session with a local hadoop-type Iceberg catalog, or skip."""
    from pyspark.sql import SparkSession

    from shaclapi_spark import sources

    spark = SparkSession.getActiveSession()
    if spark is None or not sources.iceberg_available(spark):
        pytest.skip("no Iceberg runtime/catalog in this environment")
    return spark


def test_iceberg_ref_gate_raises_cleanly(spark):
    """Without a runtime+catalog, an iceberg: ref must raise the
    documented RuntimeError naming the fix — never a raw ClassNotFound
    from the JVM. (Runs in EVERY environment; in an Iceberg-enabled one
    the gate passes and read_table resolves instead.)"""
    from shaclapi_spark import sources

    if sources.iceberg_available(spark):
        pytest.skip("Iceberg present — gate cannot raise here")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        sources.read_table(spark, "iceberg:cat.db.clips")


def test_iceberg_clip_suite_end_to_end(spark, fixture_tables):
    """With Iceberg available: write the clip fixture as an Iceberg
    table, read it back through the iceberg: ref, and run the full clip
    suite — verdict relation must equal the parquet-path run."""
    s = _iceberg_spark()
    from shaclapi_spark import fixtures, sources
    from shaclapi_spark.engine import run_suite

    cat = next(
        k.split(".")[3]
        for k, _ in s.sparkContext.getConf().getAll()
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3
    )
    s.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.t")
    fixture_tables["clips"].writeTo(f"{cat}.t.clips").createOrReplace()
    fixture_tables["transcripts"].writeTo(f"{cat}.t.transcripts").createOrReplace()
    tables = {
        "clips": sources.read_table(s, f"iceberg:{cat}.t.clips"),
        "transcripts": sources.read_table(s, f"iceberg:{cat}.t.transcripts"),
        "ref_histograms": fixture_tables["ref_histograms"],
    }
    suite = fixtures.clip_suite(include_audio=False, include_drift=False)
    via_iceberg = run_suite(s, suite, tables)
    via_parquet = run_suite(s, suite, fixture_tables)
    a = {tuple(r) for r in via_iceberg.verdicts.collect()}
    b = {tuple(r) for r in via_parquet.verdicts.collect()}
    assert a == b


def test_iceberg_snapshot_revalidation(spark, fixture_tables):
    """With Iceberg available: append rows, then check the snapshot log
    exposes both versions — the substrate revalidate.py's changelog
    shapes assume (synthesized in-sandbox via synthesize_changelog)."""
    s = _iceberg_spark()
    cat = next(
        k.split(".")[3]
        for k, _ in s.sparkContext.getConf().getAll()
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3
    )
    s.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.t")
    fixture_tables["clips"].limit(10).writeTo(f"{cat}.t.snap").createOrReplace()
    fixture_tables["clips"].limit(5).writeTo(f"{cat}.t.snap").append()
    snaps = s.sql(f"SELECT * FROM {cat}.t.snap.snapshots").count()
    assert snaps >= 2
