"""W3C SHACL ValidationReport emission — the standards-shaped output a
user migrating from the reference's SHACL world consumes.

The reference returns validation output as JSON per target (shaclapi/
api.py routes; per-entity valid/invalid sets in tests/test_main.py); a
SHACL toolchain additionally expects the spec's report vocabulary
(sh:ValidationReport / sh:ValidationResult with focusNode, sourceShape,
sourceConstraintComponent, severity). This module maps the engine's
violations relation onto that vocabulary: a distributed report relation,
plus a bounded Turtle serializer for interchange with SHACL tools.

Component mapping: spec-native kinds use the sh: namespace
(MinCount/MaxCount/In/Pattern/Or/QualifiedValueShape/...); engine-original
kinds (audio_valid, drift, functional_dep, monotonic, stat_bound, fk_*)
use the engine's own sa: namespace — honest provenance, nothing
masquerades as a spec component that isn't one. The map is derived from
the Suite object, and the DuckDB contract oracle generates its CASE from
the SAME map, so the two engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from shaclapi_spark.suite import Constraint, Suite

SH_PREFIX = "http://www.w3.org/ns/shacl#"
SA_PREFIX = "urn:shaclapi-spark:component:"

#: constraint kind -> report component term (sh: spec-native, sa: engine)
KIND_COMPONENT = {
    "not_null": "sh:MinCountConstraintComponent",
    "min_count": "sh:MinCountConstraintComponent",
    "max_count": "sh:MaxCountConstraintComponent",
    "in_set": "sh:InConstraintComponent",
    "regex": "sh:PatternConstraintComponent",
    "expr": "sh:SPARQLConstraintComponent",
    "or_group": "sh:OrConstraintComponent",
    "qualified_shape": "sh:QualifiedValueShapeConstraintComponent",
    "unique": "sa:UniqueConstraintComponent",
    "functional_dep": "sa:FunctionalDependencyConstraintComponent",
    "monotonic": "sa:MonotonicConstraintComponent",
    "audio_valid": "sa:AudioValidConstraintComponent",
    "fk_exists": "sa:ReferentialConstraintComponent",
    "fk_not_exists": "sa:BlocklistConstraintComponent",
    "fk_match": "sa:ValueMatchConstraintComponent",
    "fk_near_match": "sa:NearValueMatchConstraintComponent",
    "drift": "sa:DistributionDriftConstraintComponent",
    "stat_bound": "sa:StatBoundConstraintComponent",
}
FALLBACK_COMPONENT = "sa:ConstraintComponent"


def _range_component(c: Constraint) -> str:
    # range maps onto the spec's inclusive-bound components; a two-sided
    # range reports the min side (the violation detail carries the value)
    if c.params.get("min") is not None:
        return "sh:MinInclusiveConstraintComponent"
    return "sh:MaxInclusiveConstraintComponent"


def component_map(suite: Suite) -> dict:
    """violation constraint_id -> component term, walking every shape.

    Violation rows use the TOP-LEVEL constraint id (an or_group failure
    reports the group id — branch ids never appear). Qualified-shape
    constraints are keyed under BOTH the constraint id (the violations
    convention, engine.py's viol_structs) and the referenced shape name
    (the verdict-REASON convention), so the map serves either relation."""
    out: dict = {}
    for shape in suite.shapes:
        for c in shape.constraints:
            if c.kind == "range":
                out[c.id] = _range_component(c)
            else:
                out[c.id] = KIND_COMPONENT.get(c.kind, FALLBACK_COMPONENT)
            if c.kind == "qualified_shape":
                out[c.params["shape"]] = KIND_COMPONENT["qualified_shape"]
    return out


def validation_report(violations: DataFrame, suite: Suite) -> DataFrame:
    """Map the violations relation to ValidationResult rows:
    (focus_node, source_shape, constraint_id, component, severity).

    Pure projection over the violations relation (a literal map lookup —
    no join, no shuffle); ``detail`` is carried as ``message`` when the
    input has it."""
    cmap = component_map(suite)
    comp = F.lit(FALLBACK_COMPONENT)
    if cmap:
        lookup = F.create_map(*[F.lit(x) for kv in cmap.items() for x in kv])
        comp = F.coalesce(
            lookup[F.col("constraint_id")], F.lit(FALLBACK_COMPONENT)
        )
    cols = [
        F.col("entity_id").alias("focus_node"),
        F.col("shape").alias("source_shape"),
        F.col("constraint_id"),
        comp.alias("component"),
        F.lit("sh:Violation").alias("severity"),
    ]
    if "detail" in violations.columns:
        cols.append(F.col("detail").alias("message"))
    return violations.select(*cols)


def _ttl_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def report_turtle(
    report: DataFrame, conforms: bool | None = None, limit: int = 10000
) -> str:
    """Serialize a (bounded) report relation as a Turtle
    sh:ValidationReport document. Collects at most ``limit`` result rows
    and raises if the report exceeds it — serialization is an interchange
    step for human/tool consumption, not a data path; large reports stay
    in the report RELATION (write it as parquet instead).

    ``conforms`` defaults to "no result rows collected"."""
    rows = report.limit(limit + 1).collect()
    if len(rows) > limit:
        raise ValueError(
            f"report exceeds limit={limit} results; write the relation "
            "as parquet instead of serializing to Turtle"
        )
    if conforms is None:
        conforms = len(rows) == 0
    out = [
        f"@prefix sh: <{SH_PREFIX}> .",
        f"@prefix sa: <{SA_PREFIX}> .",
        "",
        "[] a sh:ValidationReport ;",
        f"  sh:conforms {str(bool(conforms)).lower()}",
    ]
    for r in rows:
        out[-1] += " ;"
        res = [
            "  sh:result [ a sh:ValidationResult ;",
            f'    sh:focusNode "{_ttl_escape(str(r["focus_node"]))}" ;',
            f"    sh:resultSeverity {r['severity']} ;",
            f'    sh:sourceShape "{_ttl_escape(str(r["source_shape"]))}" ;',
            f"    sh:sourceConstraintComponent {r['component']}",
        ]
        msg = r["message"] if "message" in r.__fields__ else None
        if msg is not None:
            res[-1] += " ;"
            res.append(f'    sh:resultMessage "{_ttl_escape(str(msg))}"')
        res.append("  ]")
        out.extend(res)
    out[-1] += " ."
    return "\n".join(out) + "\n"
