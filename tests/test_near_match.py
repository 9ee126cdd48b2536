"""fk_near_match: edit-distance-tolerant cross-table value equality.

Semantics mirror fk_match (valid iff within tolerance of EVERY matching
parent row's non-null value; same vacuous cases) with a graded predicate.
The seeded fixture discriminates the kinds: duplicate clips carry a
conflicting " (alt)" transcript (distance 6), so max_edits=2 reproduces
fk_match's invalid set exactly while max_edits=6 forgives only those
dup-parent conflicts."""

import pytest
from pyspark.sql import functions as F

from shaclapi_spark.engine import run_suite
from shaclapi_spark.suite import Constraint, Shape, Suite


def _suite(constraint: Constraint) -> Suite:
    return Suite(
        shapes=[
            Shape(
                name="Child",
                table="child",
                entity_col="cid",
                constraints=[constraint],
            )
        ]
    )


def _near(**params) -> Constraint:
    base = {
        "key": "pkey",
        "parent": "parent",
        "parent_key": "pkey",
        "column": "val",
        "parent_col": "pval",
    }
    base.update(params)
    return Constraint("near", "fk_near_match", base)


@pytest.fixture()
def tables(spark):
    parent = spark.createDataFrame(
        [
            ("p1", "hello world"),
            ("p2", "hello world"),
            ("p2", "hello w0rld"),   # near-duplicate parent (dist 1)
            ("p3", "hello world"),
            ("p3", "totally different"),  # conflicting parent (dist >> 2)
            ("p4", None),            # all parent values NULL -> vacuous
            ("p5", "abc"),
        ],
        "pkey string, pval string",
    )
    child = spark.createDataFrame(
        [
            ("c1", "p1", "hello world"),   # exact
            ("c2", "p1", "hallo world"),   # dist 1
            ("c3", "p1", "xyz"),           # far
            ("c4", "p2", "hello world"),   # within 1 of BOTH parents
            ("c5", "p3", "hello world"),   # conflicting parent -> invalid
            ("c6", "p4", "anything"),      # parent all-NULL -> vacuous valid
            ("c7", "missing", "x"),        # no parent row -> vacuous valid
            ("c8", "p1", None),            # local NULL -> vacuous valid
            ("c9", None, "x"),             # local key NULL -> vacuous valid
        ],
        "cid string, pkey string, val string",
    )
    return {"parent": parent, "child": child}


def _valid_map(res):
    return {r["entity_id"]: r["is_valid"] for r in res.verdicts.collect()}


def test_near_match_absolute(spark, tables):
    res = run_suite(spark, _suite(_near(max_edits=1)), tables)
    v = _valid_map(res)
    assert v == {
        "c1": True, "c2": True, "c3": False, "c4": True, "c5": False,
        "c6": True, "c7": True, "c8": True, "c9": True,
    }


def test_near_match_zero_edits_equals_fk_match(spark, tables):
    """max_edits=0 degenerates to exact equality against every parent."""
    res = run_suite(spark, _suite(_near(max_edits=0)), tables)
    v = _valid_map(res)
    assert v["c1"] is True and v["c2"] is False and v["c4"] is False


def test_near_match_ppm(spark, tables):
    # "hallo world" vs "hello world": dist 1 over 11 parent chars — the
    # exact predicate is 1e6*dist <= ppm*len, so the boundary is
    # ppm = ceil(1e6/11) = 90_910 (90_909*11 = 999_999 < 1_000_000)
    res = run_suite(spark, _suite(_near(max_cer_ppm=90_910)), tables)
    assert _valid_map(res)["c2"] is True
    res = run_suite(spark, _suite(_near(max_cer_ppm=90_909)), tables)
    assert _valid_map(res)["c2"] is False


def test_near_match_combined_bounds(spark, tables):
    # generous ppm but absolute cap 0 -> c2 fails on the absolute bound
    res = run_suite(
        spark, _suite(_near(max_edits=0, max_cer_ppm=500_000)), tables
    )
    v = _valid_map(res)
    assert v["c2"] is False and v["c1"] is True


def test_near_match_param_validation():
    with pytest.raises(ValueError, match="max_edits"):
        _near()  # neither bound


def test_fixture_near_vs_exact(spark, fixture_tables):
    """On the seeded fixture: near(k=2) == fk_match's verdicts; near(k=6)
    additionally forgives exactly the dup-parent ' (alt)' conflicts."""
    trs = fixture_tables["transcripts"]
    clips = fixture_tables["clips"]
    tbl = {"transcripts": trs, "clips": clips}

    def verdicts(c: Constraint):
        s = Suite(
            shapes=[Shape("T", "transcripts", "transcript_id", constraints=[c])]
        )
        res = run_suite(spark, s, tbl)
        return {
            r["entity_id"]
            for r in res.verdicts.filter("NOT is_valid").collect()
        }

    exact = verdicts(
        Constraint(
            "m",
            "fk_match",
            {
                "key": "clip_id",
                "parent": "clips",
                "parent_key": "clip_id",
                "column": "text",
                "parent_col": "transcript",
            },
        )
    )
    near2 = verdicts(_near(
        key="clip_id", parent="clips", parent_key="clip_id",
        column="text", parent_col="transcript", max_edits=2,
    ))
    near6 = verdicts(_near(
        key="clip_id", parent="clips", parent_key="clip_id",
        column="text", parent_col="transcript", max_edits=6,
    ))
    assert near2 == exact
    forgiven = exact - near6
    assert near6 < exact and len(forgiven) > 0
    # every forgiven transcript belongs to a duplicated (i % 997) clip
    dup_ids = {
        r["clip_id"]
        for r in clips.groupBy("clip_id").count().filter("count > 1").collect()
    }
    owner = {
        r["transcript_id"]: r["clip_id"]
        for r in trs.select("transcript_id", "clip_id").collect()
    }
    assert all(owner[t] in dup_ids for t in forgiven)


def test_plan_uses_thresholded_levenshtein(spark, tables):
    """Absolute-only tolerance must plan the 3-arg (thresholded)
    levenshtein — O(k·len), not O(len²)."""
    res = run_suite(spark, _suite(_near(max_edits=1)), tables)
    plan = res.verdicts._jdf.queryExecution().optimizedPlan().toString()
    assert "levenshtein" in plan and "Some(1)" in plan  # threshold arg set
    assert "BatchEvalPython" not in plan
