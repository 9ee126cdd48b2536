"""SHACL ValidationReport emission: component mapping, report relation,
Turtle serialization."""

import pytest

from shaclapi_spark import report
from shaclapi_spark.engine import run_suite
from shaclapi_spark.suite import Constraint, Shape, Suite


def _mini_suite():
    return Suite(
        shapes=[
            Shape(
                name="S",
                table="t",
                entity_col="id",
                constraints=[
                    Constraint("c_nn", "not_null", {"column": "v"}),
                    Constraint("c_rng", "range", {"column": "v", "min": 0, "max": 9}),
                    Constraint("c_max", "range", {"column": "v", "max": 9}),
                    Constraint(
                        "c_or",
                        "or_group",
                        branches=[
                            Constraint("b1", "expr", {"sql": "v > 100"}),
                            Constraint("b2", "in_set", {"column": "v", "values": [1]}),
                        ],
                    ),
                    Constraint(
                        "c_q",
                        "qualified_shape",
                        {"child": "c", "fk": "id", "shape": "Other", "min": 1},
                    ),
                ],
            ),
            Shape(name="Other", table="c", entity_col="cid", constraints=[]),
        ]
    )


def test_component_map_kinds_and_keys():
    m = report.component_map(_mini_suite())
    assert m["c_nn"] == "sh:MinCountConstraintComponent"
    assert m["c_rng"] == "sh:MinInclusiveConstraintComponent"
    assert m["c_max"] == "sh:MaxInclusiveConstraintComponent"
    assert m["c_or"] == "sh:OrConstraintComponent"
    # qualified keys under BOTH the constraint id (violations convention)
    # and the referenced shape name (verdict-reason convention)
    assert m["c_q"] == "sh:QualifiedValueShapeConstraintComponent"
    assert m["Other"] == "sh:QualifiedValueShapeConstraintComponent"
    assert "b1" not in m and "b2" not in m  # branch ids never appear


def test_validation_report_rows(spark):
    suite = Suite(
        shapes=[
            Shape(
                name="S",
                table="t",
                entity_col="id",
                constraints=[
                    Constraint("c_nn", "not_null", {"column": "v"}),
                    Constraint("c_rng", "range", {"column": "v", "min": 0}),
                ],
            )
        ]
    )
    t = spark.createDataFrame(
        [("a", 1), ("b", None), ("c", -5)], "id string, v int"
    )
    res = run_suite(spark, suite, {"t": t})
    rep = report.validation_report(res.violations, suite)
    rows = {r["focus_node"]: r for r in rep.collect()}
    assert rows["b"]["component"] == "sh:MinCountConstraintComponent"
    assert rows["c"]["component"] == "sh:MinInclusiveConstraintComponent"
    assert all(r["severity"] == "sh:Violation" for r in rows.values())
    assert all(r["source_shape"] == "S" for r in rows.values())
    assert "message" in rep.columns  # detail passthrough


def test_report_turtle_structure(spark):
    suite = Suite(
        shapes=[
            Shape(
                name="S",
                table="t",
                entity_col="id",
                constraints=[Constraint("c_nn", "not_null", {"column": "v"})],
            )
        ]
    )
    t = spark.createDataFrame([("a", None), ('b"x', None)], "id string, v string")
    res = run_suite(spark, suite, {"t": t})
    rep = report.validation_report(res.violations, suite)
    ttl = report.report_turtle(rep)
    assert ttl.startswith("@prefix sh: <http://www.w3.org/ns/shacl#> .")
    assert "sh:conforms false" in ttl
    assert ttl.count("a sh:ValidationResult") == 2
    assert 'sh:focusNode "a"' in ttl
    assert '\\"x' in ttl  # quote escaping
    assert ttl.rstrip().endswith(".")
    with pytest.raises(ValueError, match="limit"):
        report.report_turtle(rep, limit=1)


def test_report_turtle_conforming(spark):
    suite = Suite(
        shapes=[
            Shape(
                name="S",
                table="t",
                entity_col="id",
                constraints=[Constraint("c_nn", "not_null", {"column": "v"})],
            )
        ]
    )
    t = spark.createDataFrame([("a", "x")], "id string, v string")
    res = run_suite(spark, suite, {"t": t})
    ttl = report.report_turtle(report.validation_report(res.violations, suite))
    assert "sh:conforms true" in ttl and "ValidationResult" not in ttl
