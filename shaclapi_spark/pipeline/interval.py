"""Point-in-interval join: match each point row to every interval that
contains it — the range-predicate join (event → incident window, reading →
maintenance period, clip → recording campaign) that naive SQL expresses as
an inequality join, which Spark executes as BroadcastNestedLoopJoin
(O(points x intervals) compares) once the intervals side outgrows a
broadcast.

Reference parity: engine-original (graft brief: operators Spark lacks); the
reference has no temporal operators. The DuckDB oracle is the plain
inequality join, so semantics are pinned to the naive definition.

Implementation — bucketized equi-join:
pick a bucket width; explode every interval to the bucket ids it overlaps
(``sequence(floor(start/w), floor(end/w))``), compute each point's single
bucket id, equi-join on (key?, bucket), then apply the exact
``start <= ts <= end`` filter. A point lands in exactly one bucket and an
interval has a copy in every bucket it spans, so the equi-join finds every
true containment exactly once — no dedup pass needed.

Why this shape at 100 TB:
* the join is a hash equi-join on the bucket id: shuffle-partitioned,
  AQE-broadcastable when the exploded intervals fit, and NEVER a nested
  loop over the points relation.
* the explosion factor is ``interval_len / bucket_us + 1`` per interval —
  pick ``bucket_us`` near the typical interval length to keep it ~2x.
  The points side never explodes (it is the 100-TB side).
* per-bucket skew (an incident-heavy hour) is an equi-join hot key: AQE
  skew-join splitting applies, unlike a range join where skew has no
  mitigation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    key_col: str | None = None,
    bucket_us: int = 3_600_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to the interval rows containing them:
    ``start_col <= ts_col <= end_col`` (inclusive bounds, integer event
    time), optionally also matching on ``key_col``. Points inside k
    overlapping intervals emit k rows; ``how='left'`` keeps containment-
    free points with null interval columns. Output: all point columns,
    then all interval columns (name collisions must be resolved by the
    caller first — raise otherwise)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    clash = [
        c for c in intervals.columns if c in points.columns and c != key_col
    ]
    if clash:
        raise ValueError(f"column collisions between sides: {clash}")
    b = F.lit(int(bucket_us))
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b), F.floor(F.col(end_col) / b)
            )
        ),
    )
    pt = points.withColumn("__b", F.floor(F.col(ts_col) / b))
    on = [pt["__b"] == iv["__b"]]
    if key_col is not None:
        on.append(pt[key_col] == iv[key_col])
    cond = (
        on[0]
        & (pt[ts_col] >= iv[start_col])
        & (pt[ts_col] <= iv[end_col])
    )
    for extra in on[1:]:
        cond = cond & extra
    joined = pt.join(iv, cond, how)
    out = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c != key_col
    ]
    return joined.select(*out)
