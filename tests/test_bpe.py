"""BPE tokenizer: train (driver merge loop over the bounded word dict) +
apply (Arrow UDF greedy encode). The reference below is an independently
written naive implementation — O(n^2) recount per step — kept deliberately
different in shape from the library code."""

import re

import pytest
from pyspark.sql import functions as F

from shaclapi_spark.pipeline import corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# --- independent reference -------------------------------------------------

def _ref_train(word_counts, n_merges):
    vocab = [(list(w), c) for w, c in word_counts]
    merges = []
    for _ in range(n_merges):
        pair_counts = {}
        for syms, c in vocab:
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best = sorted(p for p, c in pair_counts.items() if c == top)[0]
        merges.append(best)
        for syms, _c in vocab:
            i = 0
            while i < len(syms) - 1:
                if (syms[i], syms[i + 1]) == best:
                    syms[i : i + 2] = [syms[i] + syms[i + 1]]
                else:
                    i += 1
    return merges


def _ref_encode(word, merges):
    syms = list(word)
    for a, b in merges:  # rank order; re-scan until this merge stops applying
        i = 0
        while i < len(syms) - 1:
            if (syms[i], syms[i + 1]) == (a, b):
                syms[i : i + 2] = [a + b]
                i = max(i - 1, 0)
            else:
                i += 1
    return syms


# --- tests -----------------------------------------------------------------

def test_train_bpe_matches_reference_on_tiny_corpus(spark):
    rows = [(1, "low low low lower lowest"), (2, "new newer newest low")]
    df = spark.createDataFrame(rows, "id long, text string")
    wf = corpus.word_frequencies(df, "text")
    got = corpus.train_bpe(df, "text", n_merges=8)
    want = _ref_train(wf, 8)
    assert got == want
    assert got[0] == ("l", "o")  # 'lo' is the most frequent pair


def test_ref_encode_and_library_encode_agree():
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lower", "lowest", "slow", "club", "er"):
        assert corpus._encode_word(w, ranks) == _ref_encode(w, merges), w


def test_tokenize_bpe_roundtrip_and_counts(spark, docs):
    merges = corpus.train_bpe(docs.limit(200), "text", n_merges=50)
    assert len(merges) == 50
    toks = corpus.tokenize_bpe(docs.limit(200), "doc_id", "text", merges)
    rows = toks.collect()
    assert len(rows) == 200
    for r in rows:
        # concatenating a doc's tokens reproduces its normalized words
        assert r.n_tokens >= r.n_words  # merges never cross word boundaries
        assert len(r.tokens) == r.n_tokens
    # spot-check one doc end-to-end against the reference encoder
    sample = docs.limit(1).collect()[0]
    norm = re.sub(r"\s+", " ", sample.text.lower()).strip()
    norm_words = [w for w in norm.split(" ") if w]
    want = []
    for w in norm_words:
        want.extend(_ref_encode(w, merges))
    got = (
        corpus.tokenize_bpe(
            docs.filter(F.col("doc_id") == sample.doc_id), "doc_id", "text", merges
        )
        .collect()[0]
        .tokens
    )
    assert got == want


def test_more_merges_never_increase_token_count(spark, docs):
    d = docs.limit(100)
    m10 = corpus.train_bpe(d, "text", n_merges=10)
    m80 = corpus.train_bpe(d, "text", n_merges=80)
    assert m80[:10] == m10  # merge list is prefix-stable
    t10 = corpus.tokenize_bpe(d, "doc_id", "text", m10, keep_tokens=False)
    t80 = corpus.tokenize_bpe(d, "doc_id", "text", m80, keep_tokens=False)
    n10 = t10.agg(F.sum("n_tokens")).collect()[0][0]
    n80 = t80.agg(F.sum("n_tokens")).collect()[0][0]
    assert n80 <= n10


def test_tokenize_bpe_no_shuffle(spark, docs):
    merges = [("a", "b")]
    plan = (
        corpus.tokenize_bpe(docs, "doc_id", "text", merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
