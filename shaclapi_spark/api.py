"""Public API facade — the analog of the reference's three HTTP entry points
(SURVEY.md §3), minus Flask: callers get DataFrames, not JSON.

reference                                   here
------------------------------------------  ------------------------------------
POST /multiprocessing (api.py:29-46 flow:   :func:`run` — full suite evaluation
  rewrite → validate ∥ query → join →        with target restriction, constraint
  post-process → output)                      removal, verdict/violation/summary
POST /validation (api.py:324-387: per-      :func:`validation_summary` — per-
  shape valid/invalid counts + rows)          shape counts + verdicts
POST /reduce (api.py:265-283: reduced       :func:`explain` — compile-only dry
  shape-name list, no data touched)           run: surviving shapes/constraints,
                                              evaluation order, cyclic groups
GET /schema-overlap-like metric             :func:`schema_overlap`
  (api.py:286-321)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from shaclapi_spark.compiler import compile_suite
from shaclapi_spark.engine import EngineConfig, SuiteResult, run_suite
from shaclapi_spark.suite import Suite


def run(
    spark: SparkSession,
    suite: Suite,
    tables: dict[str, DataFrame],
    target_shapes: list[str] | None = None,
    relevant_columns: set[str] | None = None,
    config: EngineConfig | None = None,
) -> SuiteResult:
    """Flagship entry point (POST /multiprocessing analog): validate the
    target shapes, with the reference's metadata reductions applied
    (reachability pruning always; query-driven constraint removal when
    ``relevant_columns`` is given — ReducedShapeParser.py:78-110 analog)."""
    return run_suite(
        spark,
        suite,
        tables,
        target_shapes=target_shapes,
        relevant_columns=relevant_columns,
        config=config,
    )


def validation_summary(
    spark: SparkSession,
    suite: Suite,
    tables: dict[str, DataFrame],
    target_shapes: list[str] | None = None,
    config: EngineConfig | None = None,
) -> dict:
    """POST /validation analog: {shape: {valid: n, invalid: n}} plus the
    verdict DataFrame for callers that want rows (api.py:372-387 drains the
    queue into exactly this structure)."""
    res = run_suite(
        spark, suite, tables, target_shapes=target_shapes, config=config
    )
    counts = (
        res.verdicts.groupBy("shape")
        .agg(
            F.sum(F.col("is_valid").cast("long")).alias("valid"),
            F.sum((~F.col("is_valid")).cast("long")).alias("invalid"),
        )
        .collect()
    )
    return {
        "shapes": {
            r.shape: {"valid": int(r.valid), "invalid": int(r.invalid)}
            for r in counts
        },
        "verdicts": res.verdicts,
        "violations": res.violations,
    }


def explain(
    suite: Suite,
    target_shapes: list[str] | None = None,
    relevant_columns: set[str] | None = None,
) -> dict:
    """POST /reduce analog — compile-only, no data touched: the reduced
    shape network and its evaluation order."""
    reduced, groups = compile_suite(
        suite, target_shapes or suite.names(), relevant_columns=relevant_columns
    )
    return {
        "shapes": reduced.names(),
        "order": [
            {"shapes": g.shapes, "cyclic": g.cyclic} for g in groups
        ],
        "constraints": {
            s.name: [c.id for c in s.constraints] for s in reduced.shapes
        },
    }


def schema_overlap(
    suite: Suite, targets_a: list[str], targets_b: list[str]
) -> float:
    """|reduced(A) ∩ reduced(B)| / min(|reduced(A)|, |reduced(B)|) — the
    reference's schema-overlap metric (api.py:286-321) over this engine's
    reachability reduction."""
    a, _ = compile_suite(suite, targets_a)
    b, _ = compile_suite(suite, targets_b)
    sa, sb = set(a.names()), set(b.names())
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / min(len(sa), len(sb))
