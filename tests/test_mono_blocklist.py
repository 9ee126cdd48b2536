"""Engine-level tests for the monotonic and fk_not_exists constraint kinds.

monotonic — within each entity, `column` must be non-decreasing under SOME
    row ordering consistent with `order_by` (tie-robust: per order-key group,
    min(column) >= running max(column) over earlier groups). The analog of
    the reference's intra-shape constraint conjunction
    (/root/reference/shaclapi/reduction/Reduction.py:14-23 walks shape
    constraint networks; ordering checks are our validation-tier extension).
fk_not_exists — blocklist/disjointness referential check: the local value
    must NOT appear in the parent relation; fuses into the same
    aggregated-parent join as fk_exists.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from shaclapi_spark import engine
from shaclapi_spark.suite import Constraint, Shape, Suite


@pytest.fixture(scope="module")
def mono_df(spark):
    rows = [
        # a: strictly ordered -> valid
        ("a", 1, 10.0), ("a", 2, 11.0), ("a", 3, 11.0),
        # b: inversion -> invalid
        ("b", 1, 5.0), ("b", 2, 4.0),
        # c: tie group (seq=1 twice) is sortable -> valid
        ("c", 1, 1.0), ("c", 1, 2.0), ("c", 2, 2.0),
        # d: later group's min below an earlier group's max -> invalid
        ("d", 1, 3.0), ("d", 2, 2.5), ("d", 2, 9.0),
        # e: NULL values and NULL order keys ignored -> valid
        ("e", 1, None), ("e", 2, 0.5), ("e", None, -99.0),
        # f: single row -> vacuously valid
        ("f", 7, 42.0),
        # g: non-adjacent inversion (max of group 1 > min of group 3,
        #    group 2 all-null in between must not reset the running max)
        ("g", 1, 8.0), ("g", 2, None), ("g", 3, 7.0),
    ]
    return spark.createDataFrame(rows, "ent string, seq int, v double")


def _suite(constraints):
    return Suite(
        shapes=[
            Shape(name="S", table="t", entity_col="ent", constraints=constraints)
        ]
    )


def test_monotonic_verdicts(spark, mono_df):
    suite = _suite(
        [Constraint("mono_v", "monotonic", {"order_by": "seq", "column": "v"})]
    )
    res = engine.run_suite(spark, suite, {"t": mono_df})
    got = {r.entity_id: r.is_valid for r in res.verdicts.collect()}
    assert got == {
        "a": True, "b": False, "c": True, "d": False,
        "e": True, "f": True, "g": False,
    }


def test_monotonic_matches_duckdb(spark, mono_df, tmp_path):
    """Independent oracle: the same group-then-running-max logic in DuckDB."""
    path = str(tmp_path / "t.parquet")
    mono_df.coalesce(1).write.mode("overwrite").parquet(path)
    suite = _suite(
        [Constraint("mono_v", "monotonic", {"order_by": "seq", "column": "v"})]
    )
    res = engine.run_suite(spark, suite, {"t": spark.read.parquet(path)})
    got = sorted((r.entity_id, r.is_valid) for r in res.verdicts.collect())
    exp = sorted(
        (r[0], r[1])
        for r in duckdb.sql(
            f"""
            WITH g AS (
              SELECT ent, seq, min(v) AS lo, max(v) AS hi
              FROM read_parquet('{path}/*.parquet')
              WHERE seq IS NOT NULL GROUP BY ent, seq
            ), m AS (
              SELECT ent,
                lo IS NULL
                OR max(hi) OVER (PARTITION BY ent ORDER BY seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR lo >= max(hi) OVER (PARTITION BY ent ORDER BY seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ok
              FROM g
            )
            SELECT ent, coalesce(bool_and(ok), TRUE)
            FROM read_parquet('{path}/*.parquet')
            LEFT JOIN m USING (ent) GROUP BY ent
            """
        ).fetchall()
    )
    assert got == exp


def test_monotonic_fuses_same_order_key(spark, mono_df):
    """Two monotonic constraints sharing order_by ride ONE pre-aggregate."""
    suite = _suite(
        [
            Constraint("m1", "monotonic", {"order_by": "seq", "column": "v"}),
            Constraint("m2", "monotonic", {"order_by": "seq", "column": "seq"}),
        ]
    )
    res = engine.run_suite(spark, suite, {"t": mono_df})
    plan = res.verdicts._jdf.queryExecution().optimizedPlan().toString()
    # one source scan for the entity rollup + one for the fused monotonic
    # pre-aggregate (not three)
    assert plan.lower().count("existingrdd") <= 2
    got = {r.entity_id: r.is_valid for r in res.verdicts.collect()}
    assert got["b"] is False and got["a"] is True


def test_monotonic_requires_params():
    with pytest.raises(ValueError, match="monotonic"):
        Constraint("m", "monotonic", {"column": "v"})


def test_fk_not_exists_blocklist(spark, mono_df):
    block = spark.createDataFrame([("b",), ("f",), (None,)], "bad string")
    suite = _suite(
        [
            Constraint(
                "not_blocked",
                "fk_not_exists",
                {"column": "ent", "parent": "block", "parent_col": "bad"},
            )
        ]
    )
    res = engine.run_suite(spark, suite, {"t": mono_df, "block": block})
    got = {r.entity_id: r.is_valid for r in res.verdicts.collect()}
    assert got == {
        "a": True, "b": False, "c": True, "d": True,
        "e": True, "f": False, "g": True,
    }


def test_fk_not_exists_null_local_is_vacuous(spark):
    df = spark.createDataFrame([("x", None), ("y", "k1")], "ent string, ref string")
    block = spark.createDataFrame([("k1",)], "bad string")
    suite = _suite(
        [
            Constraint(
                "nb",
                "fk_not_exists",
                {"column": "ref", "parent": "block", "parent_col": "bad"},
            )
        ]
    )
    res = engine.run_suite(spark, suite, {"t": df, "block": block})
    got = {r.entity_id: r.is_valid for r in res.verdicts.collect()}
    assert got == {"x": True, "y": False}


def test_fk_exists_and_not_exists_fuse_one_parent_join(spark, mono_df):
    """fk_exists + fk_not_exists against the same (parent, col) share the
    aggregated-parent join — the plan carries exactly ONE join of the
    blocklist relation."""
    block = spark.createDataFrame([("b",)], "bad string")
    suite = _suite(
        [
            Constraint(
                "must_hit",
                "fk_exists",
                {"column": "ent", "parent": "block", "parent_col": "bad"},
            ),
            Constraint(
                "must_miss",
                "fk_not_exists",
                {"column": "ent", "parent": "block", "parent_col": "bad"},
            ),
        ]
    )
    res = engine.run_suite(spark, suite, {"t": mono_df, "block": block})
    plan = res.verdicts._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("join") == 1
    got = {r.entity_id for r in res.verdicts.filter("is_valid").collect()}
    assert got == set()  # every entity fails one of the two opposed checks


def test_fk_not_exists_evidence(spark, mono_df):
    from shaclapi_spark import explain

    block = spark.createDataFrame([("b",)], "bad string")
    suite = _suite(
        [
            Constraint(
                "not_blocked",
                "fk_not_exists",
                {"column": "ent", "parent": "block", "parent_col": "bad"},
            )
        ]
    )
    tables = {"t": mono_df, "block": block}
    res = engine.run_suite(spark, suite, tables)
    ev = explain.violation_evidence(spark, suite, tables, res.violations)
    rows = ev.collect()
    assert {r.entity_id for r in rows} == {"b"}
    assert all(r.constraint_id == "not_blocked" for r in rows)
