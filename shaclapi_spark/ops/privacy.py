"""k-anonymity / small-group suppression: the privacy gate a corpus runs
before release — any combination of quasi-identifier columns shared by
fewer than k rows re-identifies its members, so those rows are suppressed
(or the grouping coarsened until every occupied cell reaches k).

Reference parity: none — engine-original addition in the validation
category (the "shape" is membership in a sufficiently-populated cell;
verdict semantics mirror the reference's per-entity tuples,
shaclapi/multiprocessing/functions.py:13-16).

Scale shape (100 TB): one map-side-combinable groupBy over the
quasi-identifier tuple for the cell census; the row-level verdict joins
the census back. The census relation is one row per OCCUPIED cell —
usually small enough to broadcast (cells ≪ rows by construction when
k-anonymity is achievable at all); set ``broadcast_census=False`` for
pathological cardinalities and it degrades to a shuffled join on the
same key as the census aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cell_census(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """One row per occupied quasi-identifier cell: (cols..., n_rows,
    k_ok). ``k_ok`` = the cell is safe to release as-is."""
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n_rows")
    ).withColumn("k_ok", F.col("n_rows") >= k)


def k_anonymity_verdicts(
    df: DataFrame,
    id_col: str,
    quasi_cols: list[str],
    k: int = 5,
    broadcast_census: bool = True,
) -> DataFrame:
    """Per-row verdicts: (id, quasi cols..., cell_n, is_valid) — invalid
    rows sit in a cell of fewer than k rows and must be suppressed or
    generalized before release."""
    census = cell_census(df, quasi_cols, k)
    if broadcast_census:
        census = F.broadcast(census)
    out = df.select(id_col, *quasi_cols).join(census, quasi_cols, "left")
    return out.select(
        id_col,
        *quasi_cols,
        F.col("n_rows").alias("cell_n"),
        F.col("k_ok").alias("is_valid"),
    )


def suppress_small_groups(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    broadcast_census: bool = True,
) -> DataFrame:
    """The releasable subset: rows whose quasi-identifier cell holds at
    least k rows (left-semi join against the safe cells)."""
    safe = cell_census(df, quasi_cols, k).filter(F.col("k_ok")).select(*quasi_cols)
    if broadcast_census:
        safe = F.broadcast(safe)
    return df.join(safe, quasi_cols, "left_semi")
