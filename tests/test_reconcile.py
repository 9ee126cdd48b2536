"""reconcile constraint kind: entity-level aggregate reconciliation."""

import pytest
from pyspark.sql import functions as F

from shaclapi_spark.engine import run_suite
from shaclapi_spark.suite import Constraint, Shape, Suite


@pytest.fixture()
def tables(spark):
    orders = spark.createDataFrame(
        [(1, 100.00), (2, 55.50), (3, 10.00), (4, None)],
        "ok long, total double",
    )
    lines = spark.createDataFrame(
        [(1, 60.00), (1, 40.00), (2, 55.49), (4, 1.00)],
        "fk long, amt double",
    )
    return {"orders": orders, "lines": lines}


def _suite(tol_ppm=0):
    return Suite(
        shapes=[
            Shape(
                name="OrderShape",
                table="orders",
                entity_col="ok",
                constraints=[
                    Constraint(
                        "o_total",
                        "reconcile",
                        {
                            "child": "lines",
                            "fk": "fk",
                            "expected": "CAST(round(total * 100) AS BIGINT)",
                            "amount": "CAST(round(amt * 100) AS BIGINT)",
                            "tol_ppm": tol_ppm,
                            "columns": ["total"],
                        },
                    ),
                ],
            )
        ]
    )


def test_reconcile_exact(spark, tables):
    res = run_suite(spark, _suite(), tables)
    got = {r.entity_id: r.is_valid for r in res.verdicts.collect()}
    # 1: 60+40 == 100 exact; 2: off one cent; 3: childless vs 10.00;
    # 4: NULL expected is vacuously valid
    assert got == {"1": True, "2": False, "3": False, "4": True}
    bad = {r.entity_id for r in res.violations.collect()}
    assert bad == {"2", "3"}


def test_reconcile_tolerance(spark, tables):
    res = run_suite(spark, _suite(tol_ppm=200), tables)
    got = {r.entity_id: r.is_valid for r in res.verdicts.collect()}
    # 1 cent of 55.50 ~ 180 ppm <= 200; order 3 is 100% off
    assert got == {"1": True, "2": True, "3": False, "4": True}


def test_reconcile_matches_standalone_op(spark, tables):
    from shaclapi_spark.ops.stats import reconciliation_check

    res = run_suite(spark, _suite(), tables)
    got = {r.entity_id: r.is_valid for r in res.verdicts.collect()}
    op = {
        str(r.key): r.ok
        for r in reconciliation_check(
            tables["orders"],
            tables["lines"],
            "ok",
            "fk",
            F.expr("CAST(round(total * 100) AS BIGINT)"),
            F.expr("CAST(round(amt * 100) AS BIGINT)"),
            tol_ppm=0,
        ).collect()
        if r.expected_cents is not None
    }
    # the engine's vacuous-valid NULL expected differs from the op's raw
    # relation by design; on non-null entities the two agree exactly
    for k, ok in op.items():
        assert got[k] == ok


def test_reconcile_fuses_with_counts(spark, tables):
    # a min_count on the same (child, fk) rides the same groupBy
    suite = Suite(
        shapes=[
            Shape(
                name="OrderShape",
                table="orders",
                entity_col="ok",
                constraints=[
                    Constraint(
                        "o_total",
                        "reconcile",
                        {
                            "child": "lines",
                            "fk": "fk",
                            "expected": "CAST(round(total * 100) AS BIGINT)",
                            "amount": "CAST(round(amt * 100) AS BIGINT)",
                        },
                    ),
                    Constraint(
                        "has_lines",
                        "min_count",
                        {"child": "lines", "fk": "fk", "min": 1},
                    ),
                ],
            )
        ]
    )
    res = run_suite(spark, suite, tables)
    viol = {
        (r.entity_id, r.constraint_id) for r in res.violations.collect()
    }
    assert ("3", "has_lines") in viol and ("3", "o_total") in viol
    assert ("2", "o_total") in viol and ("2", "has_lines") not in viol
    # one child aggregate for both constraints: exactly one groupBy on fk
    plan = res.verdicts._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("sum_o_total") >= 1 and plan.count("cnt_has_lines") >= 1
