"""Event sessionization: gaps-and-islands session assignment over an
event log, plus per-session rollups.

Reference parity: the reference has no event-log operators (it validates a
static graph); sessionization is an engine-original addition mandated by
the graft brief (training-data / analytics pipeline ops over the `events`
table). The batch operator is the exact-SQL analog of the streaming
``session_window`` path in ``streaming/windows.py`` — same gap semantics,
so a batch backfill and the live stream agree.

Scale shape (100 TB event logs):
* ONE hash exchange on the user key; both window passes (lag + running
  sum) and the final per-session aggregate reuse that partitioning and
  sort — Catalyst plans a single Exchange + a single Sort, and the
  groupBy(user, session_idx) is satisfied by the window's
  HashPartitioning(user) so no second shuffle (plan-asserted in
  tests/test_plans.py).
* per-user state is a sort, not a collect: the heaviest user costs one
  task's sort spill, never driver memory. For adversarially hot keys
  (one user = billions of rows) pre-split by day first — the gap rule
  only needs a window's look-back of 1 row, so day-boundary stitching is
  a cheap follow-up join; not done here because session counts are
  user-grain, which a day-split would break silently.
* all arithmetic is integer microseconds (``unix_micros``) — exact
  cross-engine parity, no timestamp-format or float-sum dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _micros(events: DataFrame, ts_col: str):
    """Event time as integer microseconds since epoch. TIMESTAMP_NTZ is
    wall-clock-exact with no timezone dependence (preferred); plain
    TIMESTAMP goes through unix_micros, which agrees with the DuckDB
    oracle's epoch_us under a UTC session timezone."""
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign every event to a session: consecutive events of one user
    belong to the same session while the gap between ADJACENT events is
    <= ``gap_minutes`` (strictly-greater gap starts a new session — the
    same rule as Spark's ``session_window``'s "gap duration" and DuckDB's
    canonical gaps-and-islands form).

    Returns the event relation + ``session_idx`` (0-based per user) and
    ``us`` (event time in integer microseconds). Ties in ``ts`` are
    ordered by ``order_col`` for determinism; tie order cannot change
    session assignment (a 0 gap never splits), only downstream
    first/last-event attribution.
    """
    w = Window.partitionBy(user_col).orderBy("us", order_col)
    gap_us = gap_minutes * 60_000_000
    with_us = events.withColumn("us", _micros(events, ts_col))
    prev = F.lag("us").over(w)
    brk = (
        F.when(prev.isNull(), F.lit(0))
        .when(F.col("us") - prev > F.lit(gap_us), F.lit(1))
        .otherwise(F.lit(0))
    )
    sidx = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_us.withColumn("session_idx", sidx.cast("int"))


def session_rollup(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
    count_type: str | None = None,
    type_col: str = "event_type",
) -> DataFrame:
    """One row per (user, session): integer-exact session boundaries and
    size — (user, session_idx, start_us, end_us, duration_us, n_events
    [, n_<count_type>]). Boundaries are integer microseconds rather than
    formatted timestamps so the relation value-hashes identically across
    engines.

    Scale shape: inherits ``sessionize``'s single exchange; the rollup
    groups on (user, session_idx), which HashPartitioning(user) already
    satisfies — no second shuffle."""
    s = sessionize(events, user_col, ts_col, order_col, gap_minutes)
    aggs = [
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if count_type is not None:
        aggs.append(
            F.sum((F.col(type_col) == count_type).cast("long")).alias(
                f"n_{count_type}"
            )
        )
    return s.groupBy(user_col, "session_idx").agg(*aggs)
