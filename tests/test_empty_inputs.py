"""Empty-input robustness: every major operator must return an empty (or
well-defined degenerate) relation on zero rows, never crash — the shape a
production job hits on an empty partition, a filtered-to-nothing corpus,
or day-one tables."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def empty_clips(spark):
    return spark.createDataFrame(
        [],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,"
        " transcript string",
    )


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )


def test_dedup_family_on_empty(spark, empty_docs):
    from shaclapi_spark.pipeline import cluster, dedup

    assert dedup.exact_dedup(empty_docs, "doc_id", "text").count() == 0
    assert (
        dedup.jaccard_pairs(empty_docs, "doc_id", "text", k=5, threshold=0.2).count()
        == 0
    )
    assert (
        dedup.minhash_lsh_neardups(
            empty_docs, "doc_id", "text", n_hashes=8, n_bands=2, k=5
        ).count()
        == 0
    )
    pairs = spark.createDataFrame([], "a long, b long")
    assert cluster.connected_components(pairs).count() == 0
    assert cluster.dedup_clusters(pairs).count() == 0
    assert cluster.dedup_survivors(empty_docs, pairs, "doc_id").count() == 0


def test_sampling_family_on_empty(spark, empty_docs):
    from shaclapi_spark.pipeline import sampling as sp

    assert sp.hash_sample(empty_docs, "doc_id", rate=0.5).count() == 0
    assert sp.stratified_quota(empty_docs, "doc_id", "lang", 5).count() == 0
    assert sp.pack_sequences(empty_docs, "doc_id", "n_chars", 100).count() == 0
    assert sp.weighted_mix(empty_docs, "doc_id", weight=2.5).count() == 0
    assert sp.epoch_shuffle(empty_docs, "doc_id").count() == 0
    assert (
        sp.budget_cut(
            empty_docs, "doc_id", "n_chars", "n_chars", 100, boundaries=[10]
        ).count()
        == 0
    )
    assert sp.interleave_sources(empty_docs, "doc_id", "source").count() == 0


def test_text_and_curation_on_empty(spark, empty_docs):
    from shaclapi_spark.pipeline import corpus, curate, text

    assert text.with_quality(empty_docs).count() == 0
    assert text.fingerprint(empty_docs, "doc_id").count() == 0
    assert corpus.top_ngrams(empty_docs).count() == 0
    assert corpus.word_frequencies(empty_docs) == []
    assert corpus.train_bpe(empty_docs) == []
    assert corpus.tokenize_bpe(empty_docs, "doc_id", "text", []).count() == 0
    bench = empty_docs
    curated, funnel = curate.curate(empty_docs, bench)
    assert curated.count() == 0
    stages = {r.stage: r.n_docs for r in funnel.collect()}
    assert set(stages.values()) == {0}
    assert curate.curate_dispositions(empty_docs, bench).count() == 0
    assert (
        curate.quality_budget_curve(
            empty_docs.withColumn("score", F.col("n_chars") / 2000.0),
            "score",
            "n_chars",
        ).count()
        == 0
    )


def test_similarity_family_on_empty(spark, empty_emb):
    from shaclapi_spark.pipeline import layout, similarity as sim

    assert (
        sim.hard_negatives(
            empty_emb, empty_emb, "vec_id", "embedding", "vec_id", "embedding",
            "label", "label",
        ).count()
        == 0
    )
    assert (
        sim.matryoshka_recall(
            empty_emb, empty_emb, "vec_id", "embedding", "vec_id", "embedding",
            dims=[8], full_dim=64,
        ).count()
        == 0
    )
    li = spark.createDataFrame([], "q long, p long, rid long")
    assigned = layout.zorder_file_assignment(
        li, [("q", 1, 50), ("p", 1, 100)], "rid", n_files=4
    )
    assert assigned.count() == 0
    assert layout.zorder_pruning_report(
        assigned, [("q", "q"), ("p", "p")]
    ).count() == 0


def test_audio_family_on_empty(spark, empty_clips):
    from shaclapi_spark.pipeline import audio_analysis as aa
    from shaclapi_spark.pipeline import multimodal as mm

    assert aa.clip_zcr(empty_clips).count() == 0
    fp = aa.audio_fingerprint(empty_clips)
    assert fp.count() == 0
    assert aa.fingerprint_matches(fp).count() == 0
    assert aa.fingerprint_matches(fp, max_bucket=4).count() == 0
    assert mm.audio_frame_features(empty_clips, frame_ms=20).count() == 0


def test_validation_on_empty(spark, empty_clips):
    from shaclapi_spark import api, fixtures
    from shaclapi_spark.ops.stats import reconciliation_check

    tables = {
        "clips": empty_clips,
        "transcripts": spark.createDataFrame(
            [],
            "transcript_id string, clip_id string, text string, lang string,"
            " n_tokens int",
        ),
        "ref_histograms": spark.createDataFrame(
            [], "column_name string, bin int, bin_lo double, bin_hi double,"
            " ref_frac double"
        ),
    }
    suite = fixtures.clip_suite(include_audio=False, include_drift=False)
    res = api.run(spark, suite, tables)
    assert res.verdicts.count() == 0
    assert res.violations.count() == 0
    clean, quar = api.enforce(spark, suite, tables, "ClipShape", "clip_id")
    assert clean.count() == 0 and quar.count() == 0
    parent = spark.createDataFrame([], "pk long, total double")
    child = spark.createDataFrame([], "fk long, amt double")
    assert (
        reconciliation_check(
            parent, child, "pk", "fk",
            F.expr("CAST(round(total*100) AS BIGINT)"),
            F.expr("CAST(round(amt*100) AS BIGINT)"),
        ).count()
        == 0
    )
