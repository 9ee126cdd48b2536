"""Transcript-QA (CER/WER) operators: hand-pinned distances, a pure-Python
DP cross-check (hypothesis), the DuckDB byte-vs-codepoint caveat, and a
no-Python-in-plan assertion."""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from shaclapi_spark.pipeline import asr_qa


def _lev(a, b):
    """Reference edit distance over arbitrary sequences (tokens or chars)."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _pairs_df(spark, rows):
    clips = spark.createDataFrame(
        [(f"c{i}", r) for i, (r, _h) in enumerate(rows)],
        "clip_id string, transcript string",
    )
    trs = spark.createDataFrame(
        [(f"t{i}", f"c{i}", h) for i, (_r, h) in enumerate(rows)],
        "transcript_id string, clip_id string, text string",
    )
    return clips, trs


def test_cer_pinned(spark):
    clips, trs = _pairs_df(
        spark,
        [
            ("kitten", "sitting"),  # classic: 3
            ("same text", "same text"),  # 0
            ("abc", ""),  # hyp empty filtered? no: '' is not NULL -> dist 3
            (None, "x"),  # ref NULL -> dropped
            ("ref", None),  # hyp NULL -> dropped
        ],
    )
    out = {
        r["transcript_id"]: r
        for r in asr_qa.pair_cer(clips, trs).collect()
    }
    assert set(out) == {"t0", "t1", "t2"}
    assert out["t0"]["edit_dist"] == 3
    assert out["t0"]["cer_ppm"] == 3_000_000 // 6
    assert out["t1"]["edit_dist"] == 0 and out["t1"]["cer_ppm"] == 0
    assert out["t2"]["edit_dist"] == 3 and out["t2"]["hyp_chars"] == 0


def test_wer_pinned(spark):
    clips, trs = _pairs_df(
        spark,
        [
            ("the cat sat", "the bat sat sat"),  # sub + ins = 2
            ("a b c", "a b c"),  # 0
            ("one  two", "one two"),  # double space collapses: 0
            ("", "x y"),  # ref has no tokens -> wer NULL, dist 2
        ],
    )
    out = {
        r["transcript_id"]: r
        for r in asr_qa.pair_wer(clips, trs).collect()
    }
    assert out["t0"]["token_dist"] == 2
    assert out["t0"]["ref_tokens"] == 3
    assert out["t0"]["wer_ppm"] == 2_000_000 // 3
    assert out["t1"]["token_dist"] == 0
    assert out["t2"]["token_dist"] == 0
    assert out["t3"]["token_dist"] == 2 and out["t3"]["wer_ppm"] is None
    assert not any(r["vocab_overflow"] for r in out.values())


def test_wer_vocab_overflow(spark):
    big = " ".join(f"tok{i}" for i in range(95))
    clips, trs = _pairs_df(spark, [(big, "tok0")])
    row = asr_qa.pair_wer(clips, trs).collect()[0]
    assert row["vocab_overflow"] is True
    assert row["token_dist"] is None and row["wer_ppm"] is None


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcd efg hij klm nop".split()), max_size=8),
            st.lists(st.sampled_from("abcd efg hij klm nop".split()), max_size=8),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_wer_matches_token_dp(spark_global, data):
    rows = [(" ".join(a), " ".join(b)) for a, b in data]
    clips, trs = _pairs_df(spark_global, rows)
    out = {r["transcript_id"]: r for r in asr_qa.pair_wer(clips, trs).collect()}
    for i, (a, b) in enumerate(data):
        assert out[f"t{i}"]["token_dist"] == _lev(a, b), (a, b)


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_duckdb_byte_vs_codepoint_caveat(spark):
    """Pin the documented divergence: Spark counts codepoints, DuckDB
    bytes — equal only on ASCII (why the contract fixture is ASCII)."""
    s = (
        spark.range(1)
        .select(F.levenshtein(F.lit("héllo"), F.lit("hello")).alias("d"))
        .collect()[0]["d"]
    )
    d = duckdb.sql("select levenshtein('héllo', 'hello')").fetchone()[0]
    assert s == 1 and d == 2
    s2 = (
        spark.range(1)
        .select(F.levenshtein(F.lit("abc"), F.lit("axc")).alias("d"))
        .collect()[0]["d"]
    )
    assert s2 == duckdb.sql("select levenshtein('abc','axc')").fetchone()[0] == 1


def test_wer_oracle_encoding_agrees_with_duckdb(spark):
    """The token→char encoding reduction produces the same distance in
    both engines on ASCII tokens (the oracle-equivalence claim)."""
    rows = [
        ("the cat sat", "the bat sat sat"),
        ("alpha beta gamma delta", "alpha gamma delta"),
        ("x", "x"),
        ("a b a b a", "b a b a b"),
    ]
    clips, trs = _pairs_df(spark, rows)
    got = {r["transcript_id"]: r["token_dist"] for r in asr_qa.pair_wer(clips, trs).collect()}
    alpha = asr_qa.ALPHABET
    for i, (a, b) in enumerate(rows):
        d = duckdb.sql(
            f"""
            with e as (select
                list_filter(string_split('{a}', ' '), x -> x != '') ta,
                list_filter(string_split('{b}', ' '), x -> x != '') tb),
            v as (select *, list_distinct(list_concat(ta, tb)) vocab from e)
            select levenshtein(
              array_to_string(list_transform(ta, t -> substr('{alpha}', list_position(vocab, t), 1)), ''),
              array_to_string(list_transform(tb, t -> substr('{alpha}', list_position(vocab, t), 1)), ''))
            from v
            """
        ).fetchone()[0]
        assert got[f"t{i}"] == d == _lev(a.split(), b.split())


def test_no_python_in_plan(spark):
    clips, trs = _pairs_df(spark, [("a b", "a c")])
    for op in (asr_qa.pair_cer, asr_qa.pair_wer):
        plan = op(clips, trs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fixture_cer_wer_shape(spark, fixture_tables):
    """Over the seeded fixture: exact-equality rows dominate; the j%41
    mutated-text rows show nonzero distances."""
    cer = asr_qa.pair_cer(fixture_tables["clips"], fixture_tables["transcripts"])
    agg = cer.agg(
        F.count("*").alias("n"),
        F.sum((F.col("edit_dist") == 0).cast("int")).alias("n_exact"),
        F.sum((F.col("edit_dist") > 0).cast("int")).alias("n_mut"),
    ).collect()[0]
    assert agg["n"] > 0 and agg["n_mut"] > 0
    assert agg["n_exact"] > agg["n_mut"]  # mutations are the 1/41 tail
    wer = asr_qa.pair_wer(fixture_tables["clips"], fixture_tables["transcripts"])
    w = wer.agg(
        F.sum(F.col("vocab_overflow").cast("int")).alias("ovf"),
        F.sum((F.col("token_dist") > 0).cast("int")).alias("n_mut"),
    ).collect()[0]
    assert w["ovf"] == 0 and w["n_mut"] > 0
