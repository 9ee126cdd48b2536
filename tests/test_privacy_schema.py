"""k-anonymity suppression and schema conformance checks."""

from pyspark.sql import Row

from shaclapi_spark.ops import privacy
from shaclapi_spark.ops.schema import ExpectedColumn, expected_from_ddl, schema_check


def _people(spark):
    rows = [
        Row(id=i, zip="10001", age_band="30s") for i in range(5)
    ] + [
        Row(id=10, zip="10002", age_band="40s"),
        Row(id=11, zip="10002", age_band="40s"),
        Row(id=12, zip="10003", age_band="20s"),
    ]
    return spark.createDataFrame(rows)


def test_k_anonymity_verdicts(spark):
    df = _people(spark)
    out = {r.id: r for r in privacy.k_anonymity_verdicts(df, "id", ["zip", "age_band"], k=3).collect()}
    assert out[0].is_valid and out[0].cell_n == 5
    assert not out[10].is_valid and out[10].cell_n == 2
    assert not out[12].is_valid and out[12].cell_n == 1


def test_suppress_small_groups(spark):
    df = _people(spark)
    kept = privacy.suppress_small_groups(df, ["zip", "age_band"], k=3).collect()
    assert sorted(r.id for r in kept) == [0, 1, 2, 3, 4]


def test_census_broadcast_plan(spark):
    df = _people(spark)
    plan = (
        privacy.k_anonymity_verdicts(df, "id", ["zip"], k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_schema_check(spark):
    df = spark.createDataFrame([Row(a=1, b="x", extra=2.0)])
    expected = [
        ExpectedColumn("a", "bigint"),
        ExpectedColumn("b", "int"),  # actually string -> mismatch
        ExpectedColumn("c", "string"),  # missing
    ]
    out = {r.column: r for r in schema_check(spark, df, expected).collect()}
    assert out["a"].status == "ok" and out["a"].is_valid
    assert out["b"].status == "type_mismatch" and out["b"].actual_type == "string"
    assert out["c"].status == "missing" and not out["c"].is_valid
    assert out["extra"].status == "extra" and not out["extra"].is_valid
    out2 = {r.column: r for r in schema_check(spark, df, expected, allow_extra=True).collect()}
    assert out2["extra"].is_valid


def test_expected_from_ddl_roundtrip(spark):
    exp = expected_from_ddl("clip_id string, sr_hz int, bytes binary")
    assert [e.name for e in exp] == ["clip_id", "sr_hz", "bytes"]
    df = spark.createDataFrame([], schema="clip_id string, sr_hz int, bytes binary")
    out = schema_check(spark, df, exp).collect()
    assert all(r.is_valid for r in out)


def test_schema_diff_changes(spark):
    from shaclapi_spark.ops.schema import schema_diff

    old = spark.createDataFrame([], "a string, b int, c double, d string, f float")
    new = spark.createDataFrame([], "a string, b bigint, d int, e binary, f double")
    got = {r.column: (r.change, r.back_compatible) for r in schema_diff(spark, old, new).collect()}
    assert got == {
        "a": ("unchanged", True),
        "b": ("type_widened", True),   # Iceberg-safe promotion
        "c": ("removed", False),
        "d": ("type_changed", False),  # string -> int is breaking
        "e": ("added", True),
        "f": ("type_widened", True),
    }


def test_schema_diff_nullability(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from shaclapi_spark.ops.schema import schema_diff

    req = StructType([StructField("x", LongType(), False)])
    opt = StructType([StructField("x", LongType(), True)])
    o = spark.createDataFrame([], req)
    n = spark.createDataFrame([], opt)
    r = schema_diff(spark, o, n).collect()[0]
    assert (r.change, r.back_compatible) == ("nullability_relaxed", True)
    r2 = schema_diff(spark, n, o).collect()[0]
    assert (r2.change, r2.back_compatible) == ("nullability_tightened", False)


def test_schema_diff_sees_nested_nullability(spark):
    from pyspark.sql.types import (
        IntegerType, StructField, StructType,
    )

    from shaclapi_spark.ops.schema import schema_diff

    inner_opt = StructType([StructField("s", StructType(
        [StructField("x", IntegerType(), True)]), True)])
    inner_req = StructType([StructField("s", StructType(
        [StructField("x", IntegerType(), False)]), True)])
    o = spark.createDataFrame([], inner_opt)
    n = spark.createDataFrame([], inner_req)
    r = schema_diff(spark, o, n).collect()[0]
    # same shape string, different nested contract -> flagged, breaking
    assert (r.change, r.back_compatible) == ("nested_changed", False)
