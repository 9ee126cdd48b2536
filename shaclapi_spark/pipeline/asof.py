"""As-of join: attach to each left row the most recent right row at or
before it (per key) — the temporal-attribution join (purchase → last view,
reading → last calibration, clip → last pipeline-config change) that Spark
has no built-in operator for.

Reference parity: engine-original (graft brief: operators the reference's
domain lacks but a large-scale pipeline needs); the reference validates a
static graph and has no temporal joins. The DuckDB oracle uses its native
``ASOF JOIN``, so semantics are pinned to the industry-standard definition
(match right.ts <= left.ts, greatest such ts wins).

Implementation — union + window, NOT a join:
tag right rows 0 and left rows 1, union them, and per key take
``last_value(right attrs, ignorenulls)`` over
``orderBy(ts, tag).rowsBetween(unboundedPreceding, currentRow)``; then
keep only left rows. Sorting right-before-left at equal timestamps gives
the inclusive (<=) match.

Why this shape at 100 TB:
* ONE hash exchange on the key for BOTH relations (the union is
  partitioned once); a sort-merge as-of join would shuffle both sides the
  same amount but then needs a custom merge — the window form gets the
  merge from Spark's existing window exec.
* no row explosion: every input row appears exactly once in the union;
  memory per task is the window frame's running last-value (O(1) per
  right attribute), not a buffered range.
* skew: a hot key costs one task's sort, the same bound as any
  sessionization/window op; salting cannot apply (the running last-value
  needs full per-key order), so adversarially hot keys should be
  pre-split by coarse time range with boundary stitching.
* ``tolerance_us`` (pandas ``merge_asof``-style) is a post-window filter
  that nulls out too-old matches — no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    prefix: str = "r_",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``right_cols`` from the most
    recent right row with the same ``key_col`` and ``ts_col`` <= the left
    row's (ties match — DuckDB ``ASOF JOIN`` semantics). Unmatched left
    rows keep nulls. ``ts_col`` must be an integer/long event time (use
    ``sessions._micros`` to derive integer microseconds first — integer
    time keeps the relation value-hash-exact across engines).

    Output: all left columns, then ``<prefix><c>`` for each requested
    right column, then ``<prefix>ts`` (matched right timestamp) and
    ``asof_gap`` (left ts - right ts, null when unmatched).

    ``tolerance_us``: matches older than this are nulled out (the match is
    discarded, the left row is kept)."""
    overlap = [c for c in right_cols if c == key_col or c == ts_col]
    if overlap:
        raise ValueError(f"right_cols may not include key/ts columns: {overlap}")
    l_tag = left.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).cast("long").alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).cast("long").alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    # carry the right timestamp alongside its attributes so the gap (and
    # tolerance) can be computed after the window
    r_tag = r_tag.withColumn("__r_ts", F.col("__ts"))
    l_tag = l_tag.withColumn("__r_ts", F.lit(None).cast("long"))
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
        for c in right_cols
    ] + [F.last("__r_ts", ignorenulls=True).over(w).alias("__m_ts")]
    joined = (
        l_tag.unionByName(r_tag)
        .select("__k", "__ts", "__tag", "__l", *carried)
        .where(F.col("__tag") == 1)
    )
    if tolerance_us is not None:
        stale = F.col("__ts") - F.col("__m_ts") > F.lit(int(tolerance_us))
        joined = joined.select(
            "__k",
            "__ts",
            "__l",
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(f"__m_{c}")).alias(f"__m_{c}")
                for c in right_cols
            ],
            F.when(stale, F.lit(None)).otherwise(F.col("__m_ts")).alias("__m_ts"),
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m_{c}").alias(f"{prefix}{c}") for c in right_cols]
    out_cols += [
        F.col("__m_ts").alias(f"{prefix}ts"),
        (F.col("__ts") - F.col("__m_ts")).alias("asof_gap"),
    ]
    return joined.select(*out_cols)
