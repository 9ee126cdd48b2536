"""Snapshot diff: key-level added / removed / changed accounting between
two versions of a table — the validation a pipeline runs between ingest
snapshots before promoting one (row-count deltas alone can hide a
same-size remove+add churn; a keyed diff cannot).

Reference parity: none — engine-original addition in the category the
north rule mandates (schema + constraint validation over evolving Iceberg
tables; Iceberg gives snapshot ids, this gives the content delta between
them).

Row identity is a fingerprint — md5 over the compared columns rendered
as strings with explicit NULL/field sentinels — so "changed" means any
compared column differs, and the whole diff is reproducible by an
independent engine from the same canonical form (full DuckDB oracle).

Scale shape (100 TB): one hash exchange per side on the key columns for
the full-outer join — the honest minimum for a keyed diff; only keys,
the group column, and 32-char digests shuffle, never payload columns.
On bucketed/Iceberg tables sorted by key both exchanges disappear
(storage-partitioned join). The rollup output is one row per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: sentinels for the canonical row rendering (cannot collide with real
#: text: \x00 never appears in valid UTF-8 strings written by the engine)
_NULL = "\x00N"
_SEP = "\x00|"


def row_fingerprint(cols: list[str]) -> Column:
    """md5 over the canonical rendering of ``cols``: each value CAST to
    string, NULLs as a sentinel, joined with a field separator. Works for
    string/integer/boolean/date columns; floating-point columns need a
    caller-chosen quantization first (cross-engine float rendering is not
    canonical)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    group_col: str | None = None,
) -> DataFrame:
    """Keyed diff detail: one row per key present in either snapshot with
    ``status`` ∈ {added, removed, changed, unchanged}.

    Keys must be unique per side (dedupe upstream — e.g. the engine's
    uniqueness constraint is the precondition this op assumes).
    ``group_col`` (e.g. a partition column) is carried through via
    COALESCE(new, old) so removed rows still report their group.
    """
    o = old.select(
        *key_cols,
        *( [F.col(group_col).alias("__g_old")] if group_col else [] ),
        row_fingerprint(compare_cols).alias("__fp_old"),
    )
    n = new.select(
        *key_cols,
        *( [F.col(group_col).alias("__g_new")] if group_col else [] ),
        row_fingerprint(compare_cols).alias("__fp_new"),
    )
    j = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("status", status)
    if group_col:
        out = out.withColumn(
            group_col, F.coalesce(F.col("__g_new"), F.col("__g_old"))
        )
        return out.select(*key_cols, group_col, "status")
    return out.select(*key_cols, "status")


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    group_col: str | None = None,
) -> DataFrame:
    """Per-group diff rollup: (group?, n_added, n_removed, n_changed,
    n_unchanged, n_old, n_new) — the verdict-grade summary a promotion
    gate reads (e.g. "changed+removed must stay under 0.1% of n_old")."""
    detail = snapshot_diff(old, new, key_cols, compare_cols, group_col)
    keys = [group_col] if group_col else []
    cnt = lambda s: F.sum(F.when(F.col("status") == s, 1).otherwise(0))  # noqa: E731
    agg = detail.groupBy(*keys).agg(
        cnt("added").alias("n_added"),
        cnt("removed").alias("n_removed"),
        cnt("changed").alias("n_changed"),
        cnt("unchanged").alias("n_unchanged"),
    )
    return agg.withColumn(
        "n_old",
        F.col("n_removed") + F.col("n_changed") + F.col("n_unchanged"),
    ).withColumn(
        "n_new",
        F.col("n_added") + F.col("n_changed") + F.col("n_unchanged"),
    )


def verdict_diff(old_verdicts: DataFrame, new_verdicts: DataFrame) -> DataFrame:
    """Per-(entity, shape) verdict transition between two validation runs
    (e.g. two table versions): ``transition`` ∈ {appeared, removed,
    regressed (valid→invalid), repaired (invalid→valid), unchanged}.

    The validation analog of snapshot_diff: a promotion gate reads the
    `regressed` rows. One shuffle on (entity_id, shape)."""
    o = old_verdicts.select("entity_id", "shape", F.col("is_valid").alias("__ov"))
    n = new_verdicts.select("entity_id", "shape", F.col("is_valid").alias("__nv"))
    j = o.join(n, ["entity_id", "shape"], "full_outer")
    transition = (
        F.when(F.col("__ov").isNull(), F.lit("appeared"))
        .when(F.col("__nv").isNull(), F.lit("removed"))
        .when(F.col("__ov") & ~F.col("__nv"), F.lit("regressed"))
        .when(~F.col("__ov") & F.col("__nv"), F.lit("repaired"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("entity_id", "shape", transition.alias("transition"))


def verdict_diff_summary(
    old_verdicts: DataFrame, new_verdicts: DataFrame
) -> DataFrame:
    """Per-(shape, transition) rollup of verdict_diff."""
    return (
        verdict_diff(old_verdicts, new_verdicts)
        .groupBy("shape", "transition")
        .agg(F.count(F.lit(1)).alias("n"))
    )
