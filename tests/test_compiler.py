"""Driver-side reduction unit tests — the tc6 analog
(/root/reference/tests/test_main.py:286-403: exact surviving constraint
objects after query-driven constraint removal, incl. OR-collapse and shape
elimination)."""

from shaclapi_spark.compiler import (
    compile_suite,
    evaluation_order,
    prune_unreachable,
    remove_constraints,
)
from shaclapi_spark.fixtures import clip_cycle_suite, clip_suite
from shaclapi_spark.suite import Constraint, Shape, Suite


def test_reachability_prune_drops_unreferenced_shape():
    suite = clip_suite()
    suite.shapes.append(
        Shape(name="Orphan", table="clips", entity_col="clip_id", constraints=[])
    )
    reduced = prune_unreachable(suite, ["ClipShape"])
    assert set(reduced.names()) == {"ClipShape", "TranscriptShape"}


def test_prune_keeps_transitive_deps():
    reduced = prune_unreachable(clip_suite(), ["TranscriptShape"])
    assert reduced.names() == ["TranscriptShape"]


def test_constraint_removal_by_columns():
    suite = clip_suite(include_audio=False, include_drift=False)
    reduced = remove_constraints(suite, ["ClipShape"], {"sr_hz"})
    ids = [c.id for c in reduced.shape("ClipShape").constraints]
    assert "sr_not_null" in ids and "sr_range" in ids
    assert "dur_range" not in ids
    # columnless (child-level / unique) constraints always survive
    assert {"clip_unique", "tr_min1", "tr_max1", "tr_valid"} <= set(ids)
    # non-target shape untouched
    assert len(reduced.shape("TranscriptShape").constraints) == 5


def test_or_collapse_to_single_branch():
    # tc6 semantics: OR list with one surviving branch collapses to a plain
    # constraint (ReducedShapeParser.py:100-106 analog)
    suite = Suite(
        shapes=[
            Shape(
                name="S",
                table="t",
                entity_col="id",
                constraints=[
                    Constraint(
                        "g",
                        "or_group",
                        branches=[
                            Constraint("g_a", "range", {"column": "a", "min": 0}),
                            Constraint("g_b", "range", {"column": "b", "min": 0}),
                        ],
                    )
                ],
            )
        ]
    )
    reduced = remove_constraints(suite, ["S"], {"a"})
    (c,) = reduced.shape("S").constraints
    assert c.kind == "range" and c.id == "g" and c.params["column"] == "a"
    # no surviving branch → whole group dropped
    reduced = remove_constraints(suite, ["S"], {"z"})
    assert reduced.shape("S").constraints == []


def test_evaluation_order_prerequisites_first():
    _, groups = compile_suite(clip_suite(), ["ClipShape"])
    order = [g.shapes for g in groups]
    assert order.index(["TranscriptShape"]) < order.index(["ClipShape"])
    assert not any(g.cyclic for g in groups)


def test_cycle_detected_as_group():
    groups = evaluation_order(clip_cycle_suite())
    (g,) = [g for g in groups if g.cyclic]
    assert set(g.shapes) == {"ClipShape", "TranscriptShape"}


def test_self_cycle():
    suite = Suite(
        shapes=[
            Shape(
                name="S",
                table="t",
                entity_col="id",
                constraints=[
                    Constraint(
                        "self",
                        "qualified_shape",
                        {"child": "t", "fk": "parent_id", "shape": "S", "min": 1},
                    )
                ],
            )
        ]
    )
    (g,) = evaluation_order(suite)
    assert g.cyclic and g.shapes == ["S"]
