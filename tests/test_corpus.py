"""Corpus n-gram statistics: top-k frequent spans + boilerplate scoring."""

import pytest
from pyspark.sql import Row, functions as F

from shaclapi_spark.pipeline import corpus


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id="d1", text="the cat sat on the mat"),
        Row(doc_id="d2", text="the cat sat on the hat"),
        Row(doc_id="d3", text="the cat sat quietly"),
        Row(doc_id="d4", text="a dog ran"),
        Row(doc_id="d5", text="The  Cat  sat on the mat the cat sat"),
        Row(doc_id="d6", text="solo"),  # < n words → zero grams
    ]
    return spark.createDataFrame(rows)


def test_top_ngrams_counts(spark, docs):
    top = corpus.top_ngrams(docs, "doc_id", "text", n=2, k=3).collect()
    # "the cat" occurs d1,d2,d3 once each, d5 twice (normalized) = 5 occ / 4 docs
    # "cat sat" the same; tie broken by ngram ASC → "cat sat" first
    assert (top[0].ngram, top[0].n_occurrences, top[0].n_docs) == ("cat sat", 5, 4)
    assert (top[1].ngram, top[1].n_occurrences, top[1].n_docs) == ("the cat", 5, 4)
    assert top[2].n_occurrences < 5


def test_top_ngrams_k_bounds(spark, docs):
    assert corpus.top_ngrams(docs, "doc_id", "text", n=2, k=1000).count() > 3
    assert corpus.top_ngrams(docs, "doc_id", "text", n=2, k=2).count() == 2


def test_boilerplate_score(spark, docs):
    scored = {
        r.doc_id: r
        for r in corpus.boilerplate_score(
            docs, "doc_id", "text", n=2, min_df=3
        ).collect()
    }
    assert len(scored) == 6
    # boilerplate set at min_df=3: "the cat", "cat sat" (df 4), "sat on",
    # "on the" (df 3)
    d1 = scored["d1"]  # grams: the cat, cat sat, sat on, on the, the mat
    assert (d1.n_grams, d1.n_boiler) == (5, 4)
    assert d1.boilerplate_frac == pytest.approx(0.8)
    d4 = scored["d4"]  # a dog, dog ran — none boilerplate
    assert (d4.n_grams, d4.n_boiler) == (2, 0)
    assert d4.boilerplate_frac == 0.0
    # sub-n doc: zero grams, NULL frac
    d6 = scored["d6"]
    assert (d6.n_grams, d6.n_boiler) == (0, 0)
    assert d6.boilerplate_frac is None
    # d5 distinct grams: the cat, cat sat, sat on, on the, the mat, mat the
    d5 = scored["d5"]
    assert (d5.n_grams, d5.n_boiler) == (6, 4)


def test_boilerplate_plan_broadcasts(spark, docs):
    plan = corpus.boilerplate_score(
        docs, "doc_id", "text", n=2, min_df=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

class TestBpePairs:
    def test_counts_match_manual(self, spark):
        from pyspark.sql import Row

        rows = [
            Row(doc_id="d1", text="aba ab"),
            Row(doc_id="d2", text="ABA  cd"),  # normalizes to "aba cd"
            Row(doc_id="d3", text="x"),  # 1-char word: no pairs
        ]
        out = {
            r.pair: (r.n_occurrences, r.n_distinct_words)
            for r in corpus.bpe_pair_counts(spark.createDataFrame(rows)).collect()
        }
        # word freqs: aba=2, ab=1, cd=1, x=1(dropped)
        # pairs: aba -> ab,ba (x2 weight); ab -> ab; cd -> cd
        assert out["ab"] == (3, 2)  # 2 from 'aba' + 1 from 'ab'
        assert out["ba"] == (2, 1)
        assert out["cd"] == (1, 1)
        assert "x" not in out

    def test_top_k_rank_order(self, spark):
        from pyspark.sql import Row

        rows = [Row(doc_id="d", text="zz zz zz yy yy ww")]
        got = corpus.bpe_pair_counts(
            spark.createDataFrame(rows), top_k=2
        ).collect()
        assert [(r.pair, r.n_occurrences) for r in got] == [("zz", 3), ("yy", 2)]

    def test_repeated_pair_in_word_counts_positions(self, spark):
        from pyspark.sql import Row

        rows = [Row(doc_id="d", text="aaa")]
        out = corpus.bpe_pair_counts(spark.createDataFrame(rows)).collect()
        # "aaa" has pairs at positions 1,2 -> 'aa' twice, one distinct word
        assert [(r.pair, r.n_occurrences, r.n_distinct_words) for r in out] == [
            ("aa", 2, 1)
        ]


class TestVocabCoverage:
    def test_oov_counts(self, spark):
        from pyspark.sql import Row

        rows = [
            Row(doc_id="a", text="the the the cat"),
            Row(doc_id="b", text="qq zz the"),
        ]
        # vocab_size=2: counts the=4, cat=1, qq=1, zz=1 → top2 = the, cat
        # (ties at 1 broken word ASC: cat < qq < zz)
        out = {
            r.doc_id: (r.n_tokens, r.n_oov)
            for r in corpus.vocab_coverage(
                spark.createDataFrame(rows), vocab_size=2
            ).collect()
        }
        assert out == {"a": (4, 0), "b": (3, 2)}

    def test_vocab_plan_broadcasts_and_takeordered(self, spark):
        from pyspark.sql import Row

        rows = [Row(doc_id=str(i), text="w%d common" % i) for i in range(50)]
        plan = (
            corpus.vocab_coverage(spark.createDataFrame(rows), vocab_size=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastHashJoin" in plan

    def test_validation(self, spark):
        from pyspark.sql import Row

        with pytest.raises(ValueError):
            corpus.vocab_coverage(
                spark.createDataFrame([Row(doc_id="a", text="x")]), vocab_size=0
            )


def test_bigram_surprisal_hand_counted(spark):
    # corpus: "a b" x3 (docs s1,s2,s3), "a c" x1 (s4) →
    # ctx(a)=4; sur("a b") = floor(log2(4/3)) = 0; sur("a c") = floor(log2(4/1)) = 2
    rows = [
        Row(doc_id="s1", text="a b"),
        Row(doc_id="s2", text="a b"),
        Row(doc_id="s3", text="a b"),
        Row(doc_id="s4", text="a c"),
        Row(doc_id="s5", text="solo"),  # < 2 words → zero bigrams, NULL mean
    ]
    out = {
        r.doc_id: r
        for r in corpus.bigram_surprisal(spark.createDataFrame(rows)).collect()
    }
    assert (out["s1"].n_bigrams, out["s1"].surprisal_sum) == (1, 0)
    assert (out["s4"].n_bigrams, out["s4"].surprisal_sum) == (1, 2)
    assert out["s4"].mean_surprisal == 2.0
    assert (out["s5"].n_bigrams, out["s5"].surprisal_sum) == (0, 0)
    assert out["s5"].mean_surprisal is None
    assert len(out) == 5


def test_bigram_surprisal_repeats_weighted(spark):
    # one doc with a repeated bigram: n is the instance count, the model
    # counts instances too — "x y" occurs 2x in d and 1x elsewhere; ctx(x)=3
    rows = [
        Row(doc_id="d", text="x y x y"),   # bigrams: "x y","y x","x y" → "x y" n=2
        Row(doc_id="e", text="x y"),
    ]
    out = {
        r.doc_id: r
        for r in corpus.bigram_surprisal(spark.createDataFrame(rows)).collect()
    }
    # model: "x y" cnt=3, "y x" cnt=1; ctx(x)=3, ctx(y)=1
    # d: 2*floor(log2(3/3)) + 1*floor(log2(1/1)) = 0; n_bigrams=3
    assert (out["d"].n_bigrams, out["d"].surprisal_sum) == (3, 0)
    assert (out["e"].n_bigrams, out["e"].surprisal_sum) == (1, 0)


def test_source_overlap_matrix(spark):
    rows = [
        Row(doc_id="o1", text="Shared  Text", source="web"),
        Row(doc_id="o2", text="shared text", source="books"),  # same digest as o1
        Row(doc_id="o3", text="shared text", source="wiki"),
        Row(doc_id="o4", text="only web", source="web"),
        Row(doc_id="o5", text="another shared", source="web"),
        Row(doc_id="o6", text="another shared", source="wiki"),
        Row(doc_id="o7", text="shared text", source="web"),  # dup within source → still 1
    ]
    out = {
        (r.source_a, r.source_b): r.n_shared_digests
        for r in corpus.source_overlap(spark.createDataFrame(rows)).collect()
    }
    # "shared text" spans {web, books, wiki} → 3 pairs; "another shared" spans
    # {web, wiki} → 1 pair (web, wiki) again
    assert out[("books", "web")] == 1
    assert out[("books", "wiki")] == 1
    assert out[("web", "wiki")] == 2
    assert len(out) == 3


def test_bigram_surprisal_vs_python_reference(spark):
    # 60-doc pseudo-random corpus from a tiny vocabulary (forces shared
    # bigrams and ctx collisions); exact comparison against an
    # independently-written Python model of the quantized surprisal
    import collections

    vocab = ["a", "bb", "ccc", "dd", "e"]
    docs = []
    x = 1
    for d in range(60):
        words = []
        for j in range(d % 7):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            words.append(vocab[x % len(vocab)])
        docs.append((f"r{d}", " ".join(words)))

    # python reference
    bigrams_by_doc = {}
    model = collections.Counter()
    for did, text in docs:
        ws = [w for w in text.lower().split() if w]
        bgs = [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]
        bigrams_by_doc[did] = bgs
        model.update(bgs)
    ctx = collections.Counter()
    for bg, c in model.items():
        ctx[bg.split(" ")[0]] += c
    expect = {}
    for did, bgs in bigrams_by_doc.items():
        sur_sum = 0
        for bg in bgs:
            q = ctx[bg.split(" ")[0]] // model[bg]
            sur_sum += q.bit_length() - 1
        expect[did] = (len(bgs), sur_sum)

    rows = [Row(doc_id=d, text=t) for d, t in docs]
    out = {
        r.doc_id: r
        for r in corpus.bigram_surprisal(spark.createDataFrame(rows)).collect()
    }
    assert len(out) == 60
    for did, (nb, ss) in expect.items():
        assert (out[did].n_bigrams, out[did].surprisal_sum) == (nb, ss), did
        if nb:
            assert out[did].mean_surprisal == ss / nb
        else:
            assert out[did].mean_surprisal is None
