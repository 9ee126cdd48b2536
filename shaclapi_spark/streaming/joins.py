"""Watermarked stream-stream joins: the streaming counterpart of
``pipeline.interval.interval_join`` — match each point event to the
interval events containing it while BOTH sides are unbounded streams.

Reference parity: engine-original (the reference has no streaming layer;
its anytime/incremental delivery maps to Structured Streaming per
SURVEY §2.8). The batch analog (``purchases_in_error_windows``) carries
the DuckDB oracle for the join semantics; the streaming tests assert the
stream output equals the batch inequality join on the same input.

Why the condition has the shape it does: Spark can only evict
stream-stream join state when the join condition bounds each side's
event time relative to the other's watermarked column. A raw
``start <= ts <= end`` bounds ``ts`` against TWO columns and gives the
state manager nothing to reason with on the interval side, so we add the
standard time-constraint form (Spark docs' "leftTime BETWEEN rightTime
AND rightTime + INTERVAL x"): ``ts BETWEEN start AND start +
max_interval`` for cleanup, plus the exact ``ts <= end`` containment
filter. Consequences, both deliberate:

* interval state is dropped once the point watermark passes
  ``start + max_interval``; point state once the interval watermark
  passes ``ts``;
* an interval LONGER than ``max_interval`` only matches points in its
  first ``max_interval`` — callers size it to the longest legal
  interval (it is a semantic bound, not a tuning knob).

Scale shape: Spark requires stream-stream joins to carry an EQUALITY
predicate (the symmetric-hash state store is keyed by it), so this op
reuses the batch operator's bucketization — each interval row explodes
to one copy per ``bucket_us`` bucket it overlaps (capped at
``max_interval``), each point computes its single bucket id, and the
equi-join runs on (bucket, key?) with the exact containment filter on
top. A point lands in exactly one bucket and an interval has one copy
per bucket it spans, so every true containment matches exactly once.
The state store is hash-partitioned by bucket id: no state scan, and
per-bucket skew is an AQE-visible hot key, exactly as in the batch
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    key_col: str | None = None,
    watermark: str = "10 minutes",
    max_interval: str = "1 hour",
    bucket_us: int = 900_000_000,
) -> DataFrame:
    """Streaming point-in-interval inner join (inclusive bounds, timestamp
    event time): every point row joins every interval row with
    ``start_col <= ts_col <= end_col`` (and equal ``key_col`` when
    given), subject to the ``max_interval`` containment bound documented
    in the module docstring. Output: all point columns, then all interval
    columns except a shared key. Both inputs must be streaming
    DataFrames; watermarks are applied here (``ts_col`` on the point
    side, ``start_col`` on the interval side) — don't pre-watermark.
    ``bucket_us`` sizes the equi-join buckets: pick it near the typical
    interval length (explosion factor ~= len/bucket_us + 1)."""
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    clash = [c for c in intervals.columns if c in points.columns and c != key_col]
    if clash:
        raise ValueError(f"column collisions between sides: {clash}")
    b = F.lit(int(bucket_us))
    p = points.withWatermark(ts_col, watermark).withColumn(
        "__pb", F.floor(F.unix_micros(F.col(ts_col)) / b)
    )
    cap = F.least(
        F.col(end_col), F.col(start_col) + F.expr(f"INTERVAL {max_interval}")
    )
    i = intervals.withWatermark(start_col, watermark).withColumn(
        "__ib",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / b),
                F.floor(F.unix_micros(cap) / b),
            )
        ),
    )
    cond = (
        (p["__pb"] == i["__ib"])
        & (p[ts_col] >= i[start_col])
        & (p[ts_col] <= i[start_col] + F.expr(f"INTERVAL {max_interval}"))
        & (p[ts_col] <= i[end_col])
    )
    if key_col is not None:
        cond = cond & (p[key_col] == i[key_col])
    joined = p.join(i, cond, "inner")
    out = [p[c] for c in points.columns] + [
        i[c] for c in intervals.columns if c != key_col
    ]
    return joined.select(*out)
