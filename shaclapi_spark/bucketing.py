"""Bucketed (co-located) table layout for the validation engine's hot keys.

Every heavy exchange in the engine hashes the same few keys: the entity
groupBy and aggregated-parent joins hash ``clips.clip_id``; child-count and
referential aggregates hash ``transcripts.clip_id`` (suite.py CHILD_KINDS;
the reference's equivalents are its join/grouping operators,
/root/reference/shaclapi/query.py inter-shape joins). At 10^12 rows those
shuffles dominate the job — unless the tables are ALREADY hash-clustered on
the key. Spark's native answer is bucketing: ``bucketBy(n, key)`` at write
time records a HashPartitioning in the catalog, and every downstream
groupBy/join on that key rides the layout with NO exchange (on Iceberg the
same contract is a ``bucket(n, key)`` partition transform + storage-partitioned
joins; the helpers below are the parquet/session-catalog expression of it).

Usage::

    bucketing.write_bucketed(clips, "clips_b", ["clip_id"], 64)
    bucketing.write_bucketed(transcripts, "transcripts_b", ["clip_id"], 64)
    tables = {"clips": spark.table("clips_b"),
              "transcripts": spark.table("transcripts_b"), ...}
    run_suite(spark, suite, tables)   # parent join + child aggs: 0 exchanges

Both sides must use the SAME bucket count for an exchange-free join; a
groupBy needs only its grouping key to be a superset of the bucket key.
``bucket_keys_for`` derives the per-table hot key straight from a suite so
callers don't hand-maintain the mapping.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession

from shaclapi_spark.suite import Suite


def bucket_keys_for(suite: Suite) -> dict[str, str]:
    """table -> the single column most worth bucketing on, derived from the
    suite's shuffle-bearing constraints: entity columns (entity groupBy),
    child fks (count/qualified aggregates), parent keys (referential joins).
    Ties break toward the entity column, then lexicographically."""
    votes: dict[str, Counter] = {}

    def vote(table: str, col: str, weight: int = 1) -> None:
        votes.setdefault(table, Counter())[col] += weight

    for s in suite.shapes:
        vote(s.table, s.entity_col, 2)  # entity groupBy always exists
        for c0 in s.constraints:
            stack = [c0]
            while stack:
                c = stack.pop()
                stack.extend(c.branches)
                p = c.params
                if c.kind in ("min_count", "max_count", "qualified_shape"):
                    vote(p["child"], p["fk"])
                elif c.kind in ("fk_exists", "fk_not_exists"):
                    vote(p["parent"], p["parent_col"])
                    vote(s.table, p["column"])
                elif c.kind == "fk_match":
                    vote(p["parent"], p["parent_key"])
                    vote(s.table, p["key"])
    return {
        t: min(cnt, key=lambda col: (-cnt[col], col))
        for t, cnt in votes.items()
    }


def _clear_orphaned_location(spark: SparkSession, table_name: str) -> None:
    """A managed table's warehouse directory can outlive its catalog entry
    (the in-memory catalog dies with the session; the warehouse dir does
    not), and CTAS then fails with LOCATION_ALREADY_EXISTS. If the table is
    NOT in the catalog but its default managed location exists on disk,
    remove the orphan so the write can proceed. Never touches the location
    of a live catalog table."""
    if spark.catalog.tableExists(table_name):
        return
    parts = table_name.split(".")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    if len(parts) == 1:
        loc = f"{warehouse}/{parts[0].lower()}"
    else:
        loc = f"{warehouse}/{'.'.join(parts[:-1]).lower()}.db/{parts[-1].lower()}"
    jpath = spark._jvm.org.apache.hadoop.fs.Path(loc)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed catalog table (parquet datasource).

    ``sort_cols`` additionally sorts within each bucket file — joins then
    skip the per-partition sort of sort-merge join. ``path`` makes it an
    external table (survives the session; re-register with
    ``register_bucketed`` elsewhere)."""
    if path is None:
        _clear_orphaned_location(df.sparkSession, table_name)
    w = df.write.mode("overwrite").format("parquet")
    w = w.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucket_tables(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    suite: Suite,
    n_buckets: int = 64,
    prefix: str = "b_",
) -> dict[str, DataFrame]:
    """Write every suite table bucketed on its hot key (one-time layout
    cost: one full shuffle-free scan + write per table) and return the
    bucketed replacements. Tables the suite never shuffles are passed
    through unchanged."""
    keys = bucket_keys_for(suite)
    out: dict[str, DataFrame] = {}
    for name, df in tables.items():
        key = keys.get(name)
        if key is None or key not in df.columns:
            out[name] = df
            continue
        tbl = f"{prefix}{name}"
        write_bucketed(df, tbl, [key], n_buckets, sort_cols=[key])
        out[name] = spark.table(tbl)
    return out
