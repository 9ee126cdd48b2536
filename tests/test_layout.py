"""Z-order layout: key construction, file assignment, pruning report."""

import duckdb
import pytest
from pyspark.sql import functions as F

from shaclapi_spark.pipeline import layout

SF = "/root/testdata/sf0.001"

DIMS = [
    ("CAST(l_quantity AS BIGINT)", 1, 50),
    ("CAST(round(l_extendedprice * 100) AS BIGINT)", 90000, 10500000),
]
STATS = [
    ("CAST(l_quantity AS BIGINT)", "qty"),
    ("CAST(round(l_extendedprice * 100) AS BIGINT)", "cents"),
]
BOX = {"qty": (10, 20), "cents": (1000000, 2000000)}


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet").withColumn(
        "rid", F.expr("l_orderkey * 10 + l_linenumber")
    )


def test_zorder_key_single_dim_is_identity(spark):
    df = spark.createDataFrame([(i,) for i in range(16)], "x long")
    got = {
        r.x: r.zkey
        for r in layout.with_zorder_key(df, [("x", 0, 15)], bits=4).collect()
    }
    assert got == {i: i for i in range(16)}


def test_zorder_key_interleaves_bits(spark):
    # (x=0b11, y=0b00) -> bits at even positions; (x=0, y=0b11) -> odd
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3)], "x long, y long")
    got = {
        (r.x, r.y): r.zkey
        for r in layout.with_zorder_key(
            df, [("x", 0, 3), ("y", 0, 3)], bits=2
        ).collect()
    }
    assert got == {(3, 0): 0b0101, (0, 3): 0b1010, (3, 3): 0b1111}


def test_zorder_key_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5,), (99,)], "x long")
    got = sorted(
        r.zkey for r in layout.with_zorder_key(df, [("x", 0, 15)], bits=4).collect()
    )
    assert got == [0, 15]


def test_zorder_sql_dialects_agree(spark, lineitem):
    zsql = layout.zorder_sql(DIMS, 8, "duckdb")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
    )
    want = dict(
        con.execute(
            f"SELECT l_orderkey*10 + l_linenumber, {zsql} FROM lineitem"
        ).fetchall()
    )
    got = {
        r.rid: r.zkey
        for r in layout.with_zorder_key(lineitem, DIMS, bits=8).collect()
    }
    assert got == want


def test_file_assignment_equal_height_and_deterministic(spark, lineitem):
    a1 = layout.zorder_file_assignment(lineitem, DIMS, "rid", n_files=16)
    a2 = layout.zorder_file_assignment(lineitem, DIMS, "rid", n_files=16)
    sizes = {r.file: r.n for r in a1.groupBy("file").agg(F.count("*").alias("n")).collect()}
    n = lineitem.count()
    assert set(sizes) == set(range(16))
    assert all(abs(s - n / 16) <= 1 for s in sizes.values())
    assert a1.exceptAll(a2).count() == 0


def test_file_assignment_no_single_partition_window(spark, lineitem):
    plan = (
        layout.zorder_file_assignment(lineitem, DIMS, "rid", n_files=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the rank window partitions by the range bucket, never a global window
    assert "SinglePartition" not in plan


def test_pruning_report_matches_duckdb(spark, lineitem):
    assigned = layout.zorder_file_assignment(lineitem, DIMS, "rid", n_files=16)
    rows = layout.zorder_pruning_report(assigned, STATS, box=BOX).orderBy("file").collect()
    got = [
        (r.file, r.n_rows, r.min_qty, r.max_qty, r.min_cents, r.max_cents,
         r.n_match, r.would_scan)
        for r in rows
    ]
    zsql = layout.zorder_sql(DIMS, 8, "duckdb")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    o = con.execute(f"""
WITH k AS (
  SELECT l_orderkey*10 + l_linenumber AS rid, {zsql} AS zkey,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_extendedprice*100) AS BIGINT) AS p
  FROM lineitem
), r AS (
  SELECT *, row_number() OVER (ORDER BY zkey, rid) - 1 AS r0,
         count(*) OVER () AS n FROM k
), a AS (SELECT *, (r0 * 16) // n AS file FROM r)
SELECT file, count(*), min(q), max(q), min(p), max(p),
  sum(CASE WHEN q BETWEEN 10 AND 20 AND p BETWEEN 1000000 AND 2000000
      THEN 1 ELSE 0 END),
  (min(q) <= 20 AND max(q) >= 10 AND min(p) <= 2000000 AND max(p) >= 1000000)
FROM a GROUP BY 1 ORDER BY 1""").fetchall()
    assert got == [tuple(r) for r in o]


def test_zorder_prunes_better_than_single_dim_sort(spark, lineitem):
    z = layout.zorder_file_assignment(lineitem, DIMS, "rid", n_files=16)
    z_scans = (
        layout.zorder_pruning_report(z, STATS, box=BOX)
        .filter("would_scan")
        .count()
    )
    one = layout.zorder_file_assignment(lineitem, DIMS[:1], "rid", n_files=16)
    one_scans = (
        layout.zorder_pruning_report(one, STATS, box=BOX)
        .filter("would_scan")
        .count()
    )
    assert z_scans < one_scans  # the whole point of the layout


def test_unknown_box_name_raises(spark, lineitem):
    assigned = layout.zorder_file_assignment(lineitem, DIMS, "rid", n_files=4)
    with pytest.raises(KeyError):
        layout.zorder_pruning_report(assigned, STATS, box={"nope": (0, 1)}).collect()


def test_write_zordered_roundtrip(spark, lineitem, tmp_path):
    path = str(tmp_path / "zli")
    layout.write_zordered(lineitem, path, DIMS, "rid", n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == lineitem.count()
    assert back.select("file").distinct().count() == 8
    # file dirs exist on disk (one partition dir per z-file)
    import os

    dirs = [d for d in os.listdir(path) if d.startswith("file=")]
    assert len(dirs) == 8
