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


# ---------------------------------------------------------------------------
# ordering strategies (TARGET IN BIG analog, DFS/BFS, seed override —
# ref config.py:192-250, reduction/travshacl/ReducedShapeSchema.py:64-83)
# ---------------------------------------------------------------------------

def _q(cid, ref):
    return Constraint(
        cid, "qualified_shape", {"child": "t", "fk": "fk", "shape": ref, "min": 1}
    )


def _diamond():
    return Suite(
        shapes=[
            Shape("A", "t", "id", constraints=[_q("a_b", "B"), _q("a_c", "C")]),
            Shape("B", "t", "id", constraints=[_q("b_d", "D")]),
            Shape("C", "t", "id", constraints=[_q("c_d", "D")]),
            Shape("D", "t", "id", constraints=[]),
        ]
    )


def test_heuristic_order_diamond():
    order = [g.shapes[0] for g in evaluation_order(_diamond(), ["A"])]
    assert order == ["D", "B", "C", "A"]


def test_heuristic_prefers_helpers_over_targets():
    # C is a pure helper: at the same ready level it runs before target B
    order = [g.shapes[0] for g in evaluation_order(_diamond(), ["A", "B"])]
    assert order == ["D", "C", "B", "A"]


def test_heuristic_higher_dependent_count_first():
    suite = Suite(
        shapes=[
            Shape("A", "t", "id", constraints=[_q("a_b", "B"), _q("a_c", "C")]),
            Shape("B", "t", "id", constraints=[_q("b_e", "E"), _q("b_f", "F")]),
            Shape("C", "t", "id", constraints=[_q("c_e", "E")]),
            Shape("E", "t", "id", constraints=[]),
            Shape("F", "t", "id", constraints=[]),
        ]
    )
    order = [g.shapes[0] for g in evaluation_order(suite, ["A"])]
    # E has 2 dependents, F has 1 → E first among the initially-ready helpers
    assert order.index("E") < order.index("F")
    assert order.index("E") < order.index("B") and order.index("F") < order.index("B")


def test_dfs_order():
    order = [g.shapes[0] for g in evaluation_order(_diamond(), ["A"], strategy="dfs")]
    assert order == ["D", "B", "C", "A"]


def test_bfs_order():
    order = [g.shapes[0] for g in evaluation_order(_diamond(), ["A"], strategy="bfs")]
    assert order == ["D", "B", "C", "A"]


def test_seed_shape_override():
    order = [
        g.shapes[0]
        for g in evaluation_order(_diamond(), ["A"], seed_shape="C")
    ]
    # C's prerequisite downset {C, D} is scheduled as early as topology allows
    assert order == ["D", "C", "B", "A"]


def test_all_strategies_are_topological():
    suite = clip_cycle_suite()
    for strategy in ("heuristic", "dfs", "bfs"):
        groups = evaluation_order(suite, strategy=strategy)
        seen = set()
        for g in groups:
            for n in g.shapes:
                deps = suite.shape(n).shape_refs() - set(g.shapes)
                assert deps <= seen, (strategy, n)
            seen |= set(g.shapes)
