"""Schema conformance check: compare a DataFrame's actual schema against
a declared expectation and emit verdict rows — the reference's shape-
schema idea applied to the TABLE's shape instead of its rows (a missing
or retyped column should fail validation before any row constraint runs,
with the same verdict vocabulary).

Driver-side only: inspects ``df.schema``, touches no data, launches no
job — safe to run as a pre-flight gate in front of every suite
evaluation (engine callers can treat a failed schema check exactly like
a failed constraint wave).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class ExpectedColumn:
    name: str
    type: str  # Spark simpleString form: "string", "int", "binary", ...
    nullable: bool = True  # False = column must be declared non-nullable


def expected_from_ddl(ddl: str) -> list[ExpectedColumn]:
    """Parse a DDL string ("clip_id string, sr_hz int, ...") into
    expectations (all nullable-tolerant)."""
    struct = StructType.fromDDL(ddl)
    return [
        ExpectedColumn(f.name, f.dataType.simpleString(), True) for f in struct.fields
    ]


def schema_check(
    spark: SparkSession,
    df: DataFrame,
    expected: list[ExpectedColumn],
    allow_extra: bool = False,
) -> DataFrame:
    """Verdict rows, one per expected or unexpected column:
    (column, status, expected_type, actual_type, is_valid) with status ∈
    {ok, missing, type_mismatch, nullability, extra}.

    ``allow_extra=True`` downgrades surplus columns to valid (schema
    evolution by addition is often fine; renames and drops never are).
    """
    actual = {f.name: f for f in df.schema.fields}
    rows: list[tuple] = []
    for exp in expected:
        f = actual.get(exp.name)
        if f is None:
            rows.append((exp.name, "missing", exp.type, None, False))
        elif f.dataType.simpleString() != exp.type:
            rows.append(
                (exp.name, "type_mismatch", exp.type, f.dataType.simpleString(), False)
            )
        elif not exp.nullable and f.nullable:
            rows.append((exp.name, "nullability", exp.type, f.dataType.simpleString(), False))
        else:
            rows.append((exp.name, "ok", exp.type, f.dataType.simpleString(), True))
    declared = {e.name for e in expected}
    for name, f in actual.items():
        if name not in declared:
            rows.append(
                (name, "extra", None, f.dataType.simpleString(), bool(allow_extra))
            )
    return spark.createDataFrame(
        rows,
        schema=(
            "column string, status string, expected_type string, "
            "actual_type string, is_valid boolean"
        ),
    )


# reader-safe type promotions (Iceberg's allowed evolutions): widening
# integrals, float->double. Everything else — narrowing, string<->numeric,
# decimal scale changes — is breaking.
_SAFE_WIDENINGS = {
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
}


def schema_diff(
    spark: SparkSession,
    old: DataFrame,
    new: DataFrame,
) -> DataFrame:
    """Schema EVOLUTION diff between two table versions — the structural
    companion of the keyed row diff (`ops.diff.snapshot diff` looks at
    values; this looks at the shape the values live in). One row per
    column that exists in either version:
    (column, change, old_type, new_type, back_compatible) with change ∈
    {unchanged, added, removed, type_changed, type_widened,
    nested_changed, nullability_tightened, nullability_relaxed}.

    ``back_compatible`` encodes the standard reader contract (Iceberg's
    allowed schema evolutions): additions, nullability RELAXATION, and
    the widening promotions (int→bigint, float→double, ...) are safe for
    existing readers; removals, any other retype, changes INSIDE nested
    struct/array/map types (compared via the type's full json form, not
    the shape string), and tightening nullable → required are breaking.

    Driver-side only (inspects schemas, launches no job) — run it between
    ``revalidate_incremental`` versions to decide whether the old verdict
    relation is even comparable before diffing rows."""
    o = {f.name: f for f in old.schema.fields}
    n = {f.name: f for f in new.schema.fields}
    rows: list[tuple] = []
    for name in sorted(set(o) | set(n)):
        fo, fn = o.get(name), n.get(name)
        if fo is None:
            rows.append((name, "added", None, fn.dataType.simpleString(), True))
        elif fn is None:
            rows.append((name, "removed", fo.dataType.simpleString(), None, False))
        elif fo.dataType.json() != fn.dataType.json():
            # json (not simpleString) so NESTED nullability/metadata edits
            # inside struct/array/map types register; a widening promotion
            # (the Iceberg-safe set) is the one retype readers tolerate
            widened = (
                fo.dataType.simpleString(),
                fn.dataType.simpleString(),
            ) in _SAFE_WIDENINGS
            same_shape = fo.dataType.simpleString() == fn.dataType.simpleString()
            rows.append(
                (
                    name,
                    "type_widened"
                    if widened
                    else ("nested_changed" if same_shape else "type_changed"),
                    fo.dataType.simpleString(),
                    fn.dataType.simpleString(),
                    widened,
                )
            )
        elif fo.nullable != fn.nullable:
            rows.append(
                (
                    name,
                    "nullability_tightened" if fo.nullable else "nullability_relaxed",
                    fo.dataType.simpleString(),
                    fn.dataType.simpleString(),
                    not fo.nullable,  # relaxing required→nullable is safe
                )
            )
        else:
            rows.append(
                (
                    name,
                    "unchanged",
                    fo.dataType.simpleString(),
                    fn.dataType.simpleString(),
                    True,
                )
            )
    return spark.createDataFrame(
        rows,
        schema=(
            "column string, change string, old_type string, "
            "new_type string, back_compatible boolean"
        ),
    )
