"""Snapshot diff: keyed added/removed/changed accounting between table
versions."""

from pyspark.sql import Row

from shaclapi_spark.ops import diff


def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, g=g, v=v, s=s) for k, g, v, s in rows],
        schema="k int, g string, v int, s string",
    )


def test_snapshot_diff_detail(spark):
    old = _snap(spark, [(1, "a", 10, "x"), (2, "a", 20, "y"), (3, "b", 30, None)])
    new = _snap(spark, [(2, "a", 21, "y"), (3, "b", 30, None), (4, "b", 40, "z")])
    out = {
        r.k: (r.status, r.g)
        for r in diff.snapshot_diff(old, new, ["k"], ["v", "s"], "g").collect()
    }
    assert out == {
        1: ("removed", "a"),
        2: ("changed", "a"),
        3: ("unchanged", "b"),
        4: ("added", "b"),
    }


def test_null_vs_empty_not_confused(spark):
    old = _snap(spark, [(1, "a", 10, None)])
    new = _snap(spark, [(1, "a", 10, "")])
    out = diff.snapshot_diff(old, new, ["k"], ["v", "s"]).collect()
    assert out[0].status == "changed"


def test_snapshot_diff_summary(spark):
    old = _snap(spark, [(1, "a", 10, "x"), (2, "a", 20, "y"), (3, "b", 30, None)])
    new = _snap(spark, [(2, "a", 21, "y"), (3, "b", 30, None), (4, "b", 40, "z")])
    out = {
        r.g: r
        for r in diff.snapshot_diff_summary(old, new, ["k"], ["v", "s"], "g").collect()
    }
    assert (out["a"].n_removed, out["a"].n_changed, out["a"].n_old, out["a"].n_new) == (1, 1, 2, 1)
    assert (out["b"].n_added, out["b"].n_unchanged, out["b"].n_old, out["b"].n_new) == (1, 1, 1, 2)


def test_ungrouped_summary(spark):
    old = _snap(spark, [(1, "a", 10, "x")])
    new = _snap(spark, [(1, "a", 11, "x"), (2, "b", 2, "q")])
    r = diff.snapshot_diff_summary(old, new, ["k"], ["v"]).collect()[0]
    assert (r.n_added, r.n_changed, r.n_old, r.n_new) == (1, 1, 1, 2)
