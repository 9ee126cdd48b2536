"""Event-time windowed aggregation + stateful entity-grain streaming checks.

Two Structured-Streaming operators the reference's bounded work-queues never
needed (SURVEY.md §2.8: "no watermarks, event-time windows, or late-data
handling exist") but an unbounded 100-TB validation stream does:

* :func:`windowed_event_counts` — event-time tumbling-window counts with a
  watermark: late rows beyond the watermark are dropped, window state is
  evicted once the watermark passes (bounded state at any scale).
* :func:`streaming_entity_counts` — the anytime analog of the engine's
  cardinality constraints (A1) over an unbounded child-row stream, via
  ``applyInPandasWithState``: per-entity running counts with early-decidable
  verdicts — a ``max_count`` violation is emitted the moment the count
  crosses the bound (the reference's early-invalid propagation,
  ValidationResultStreaming.py:18-21, recast on a stream); ``min_count``
  satisfaction is emitted the moment ``n >= min``; ``min_count`` *violation*
  is undecidable on an unbounded stream and stays ``pending`` (the batch
  engine's EOF rule decides it; this is exactly the reference's
  "undecided ⇒ valid at termination" boundary).

Scale notes: both operators keep state per group key only (window × key /
entity), partitioned by the stream's shuffle — no driver state, no
unbounded growth (watermark eviction / idle-timeout respectively).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "etype",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time counts per (window, key) with late-data handling.

    Append output mode: a window's row is emitted exactly once, when the
    watermark guarantees no more late rows can join it. The batch oracle is
    ``groupBy(window(ts))`` over the same data (asserted in tests).
    """
    keys = [F.window(F.col(ts_col), window).alias("win")]
    if key_col is not None:
        keys.append(F.col(key_col))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *([F.col(key_col)] if key_col is not None else []),
            "n",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    id_col: str,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """In-stream exact dedup: keep the FIRST row per id seen within the
    watermark horizon — the streaming analog of the uniqueness constraint
    and of ``pipeline.dedup.exact_dedup``. State holds one entry per id
    and is evicted as the watermark advances, so state is bounded by the
    id arrival rate × horizon, not by stream length (the property that
    makes this viable on an unbounded 100-TB/day feed). Duplicates farther
    apart than the watermark are NOT caught here — that is the batch
    dedup's job, mirroring the row-vs-entity split in incremental.py."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )


_COUNT_OUT = StructType(
    [
        StructField("entity_id", StringType()),
        StructField("n_rows", LongType()),
        StructField("min_status", StringType()),   # satisfied | pending
        StructField("max_status", StringType()),   # ok_so_far | violated
    ]
)
_COUNT_STATE = StructType([StructField("n", LongType())])


def streaming_entity_counts(
    stream: DataFrame,
    entity_col: str,
    min_count: int | None = None,
    max_count: int | None = None,
) -> DataFrame:
    """Per-entity running cardinality over an unbounded child-row stream.

    Each micro-batch updates the entity's persistent count and emits its
    current verdict row (update semantics — downstream sinks upsert on
    entity_id). Early decidability mirrors the batch engine's
    short-circuit: `max` flips to ``violated`` permanently; `min` flips to
    ``satisfied`` permanently; otherwise ``pending`` / ``ok_so_far``.
    """
    mn = -1 if min_count is None else int(min_count)
    mx = -1 if max_count is None else int(max_count)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame(
            {
                "entity_id": [key[0]],
                "n_rows": [n],
                "min_status": [
                    "satisfied" if (mn >= 0 and n >= mn) else "pending"
                ],
                "max_status": [
                    "violated" if (mx >= 0 and n > mx) else "ok_so_far"
                ],
            }
        )

    return (
        stream.select(F.col(entity_col).cast("string").alias("entity_id"))
        .groupBy("entity_id")
        .applyInPandasWithState(
            update,
            outputStructType=_COUNT_OUT,
            stateStructType=_COUNT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sessions(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization: per-key session windows that close when no
    event arrives within ``gap`` (``F.session_window`` — merging-window
    state, evicted once the watermark passes the session end). The batch
    backfill analog is :func:`shaclapi_spark.pipeline.sessions.sessionize`
    — same gap rule, so live and backfilled session counts agree (the one
    boundary nit: ``session_window`` keeps an event that lands EXACTLY at
    gap distance in a new session only per its open-interval merge rule;
    the batch rule splits strictly-greater gaps — ties at exactly the gap
    are measure-zero for real timestamps, and both sides are documented).

    Scale shape: state is per (key, open session) only; the shuffle is on
    the key, and session merge happens in the state store — no unbounded
    growth under the watermark."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
