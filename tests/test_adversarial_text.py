"""Adversarial text robustness: emoji, CJK, RTL, combining marks, control
characters, very long tokens, and null bytes through every text-facing
operator — web corpora contain all of these on day one."""

import pytest
from pyspark.sql import functions as F

ADVERSARIAL = [
    (1, "hello world plain ascii text here", "en", "src0"),
    (2, "😀🎉🚀 emoji only 🌍🔥💯", "en", "src0"),
    (3, "这是一段中文文本 没有空格的语言测试", "zh", "src1"),
    (4, "مرحبا بالعالم نص عربي من اليمين إلى اليسار", "ar", "src1"),
    (5, "éléphant combining marks café", "fr", "src0"),
    (6, "tab\there newline\nthere carriage\rreturn", "en", "src0"),
    (7, "a" * 5000, "en", "src2"),  # one pathological 5k-char token
    (8, "null\x00byte and bell\x07char", "en", "src2"),
    (9, "", "en", "src2"),  # empty text
    (10, "   ", "en", "src2"),  # whitespace only
    (11, "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ ａｎｄ ½ fractions ∑ math", "en", "src1"),
    (12, "mixed 中文 english العربية all in one", "mixed", "src1"),
]


@pytest.fixture(scope="module")
def adv(spark):
    df = spark.createDataFrame(
        ADVERSARIAL, "doc_id long, text string, lang string, source string"
    )
    return df.withColumn("n_chars", F.length("text").cast("long"))


def test_quality_and_langid_survive(spark, adv):
    from shaclapi_spark.pipeline import text

    rows = text.with_quality(adv).collect()
    assert len(rows) == len(ADVERSARIAL)
    for r in rows:
        assert r.n_tokens >= 0 and r.max_token_len >= 0
    lid = adv.withColumn("lid", text.lang_id(F.col("text"))).collect()
    assert len(lid) == len(ADVERSARIAL)  # never crashes, always labels


def test_ngrams_fingerprints_dedup_survive(spark, adv):
    from shaclapi_spark.pipeline import corpus, dedup, text

    assert text.fingerprint(adv, "doc_id").count() == len(ADVERSARIAL)
    # shingle/gram machinery over empty and 5k-char docs
    pairs = dedup.jaccard_pairs(adv, "doc_id", "text", k=5, threshold=0.1)
    pairs.collect()  # must plan + run
    assert dedup.exact_dedup(adv, "doc_id", "text").count() <= len(ADVERSARIAL)
    assert corpus.top_ngrams(adv, n=2, k=10).count() <= 10
    sigs = dedup.minhash_lsh_neardups(
        adv, "doc_id", "text", n_hashes=8, n_bands=2, k=5
    )
    sigs.collect()


def test_bpe_survives(spark, adv):
    from shaclapi_spark.pipeline import corpus

    merges = corpus.train_bpe(adv, "text", n_merges=20)
    toks = corpus.tokenize_bpe(adv, "doc_id", "text", merges).collect()
    assert len(toks) == len(ADVERSARIAL)
    for r in toks:
        # lossless: tokens concatenate back to the normalized words
        assert r.n_tokens >= r.n_words


def test_scrub_and_webclean_survive(spark, adv):
    from shaclapi_spark.pipeline import scrub, webclean

    out = scrub.scrub(adv, "text").collect()
    assert len(out) == len(ADVERSARIAL)
    wc = webclean.with_encoding_quality(adv, "text").collect()
    assert len(wc) == len(ADVERSARIAL)
    assert webclean.extract_urls(adv, "doc_id", "text").count() >= 0


def test_curation_funnel_survives(spark, adv):
    from shaclapi_spark.pipeline import curate

    curated, funnel = curate.curate(
        adv, adv.limit(2), min_tokens=1, max_token_len=10_000
    )
    stages = {r.stage: r.n_docs for r in funnel.collect()}
    assert stages["raw"] == len(ADVERSARIAL)
    disp = curate.curate_dispositions(
        adv, adv.limit(2), min_tokens=1, max_token_len=10_000
    )
    assert disp.count() == len(ADVERSARIAL)


def test_budget_and_shuffle_survive(spark, adv):
    from shaclapi_spark.pipeline import sampling as sp

    assert sp.epoch_shuffle(adv, "doc_id").count() == len(ADVERSARIAL)
    cut = sp.budget_cut(
        adv.withColumn("prio", F.col("n_chars")),
        "doc_id", "n_chars", "prio", budget=10_000, boundaries=[100],
    )
    assert cut.count() <= len(ADVERSARIAL)
