"""Z-order data layout: multi-dimensional file clustering + a pruning-
effectiveness report — the write-side optimization a 100-TB table needs so
that LATER reads can skip files on more than one column.

A table sorted by one column prunes perfectly on that column and not at all
on any other; interleaving the bits of several normalized columns (the
Z-order / Morton curve) gives every dimension partial locality, so a file
that holds a compact z-range covers a compact hyper-rectangle in dimension
space and per-file min/max statistics (exactly what parquet row-group /
Iceberg manifest stats store) can skip it for box predicates on ANY of the
interleaved dimensions. This is the same layout device Delta's OPTIMIZE
ZORDER BY and Iceberg's sort-order rewrite apply; here it is built from
exact integer arithmetic so the assignment is reproducible cross-engine.

Everything is deterministic and engine-portable:

* normalization: ``(col - lo) * 2^bits DIV span`` — exact integer math,
  clamped to the edge cells (out-of-range rows land in cell 0 / 2^bits-1);
* the z-key: bit-interleave of the normalized cells, generated as a
  portable SQL expression (``zorder_sql`` emits the spark and duckdb
  dialects from one generator — one formula, two engines);
* file assignment: exact global rank by (zkey, id) via the same two-phase
  range-bucket device as ``sampling.epoch_shuffle`` (NO single-partition
  window), then ``file = rank * n_files DIV n_rows`` — equal-height files.

Reference parity: no analog — the reference reads from a SPARQL endpoint
and has no storage layout layer; this extends the engine's write path
(bucketing.py is the join-locality counterpart; z-order is the scan-pruning
counterpart).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from shaclapi_spark.pipeline.sampling import bucket_prefix_offsets, offsets_map

Dim = tuple  # (col_sql: str, lo: int, hi: int) — col_sql must be integral


def _norm_sql(col_sql: str, lo: int, hi: int, bits: int, dialect: str) -> str:
    """Exact equal-width cell of ``col_sql`` in [0, 2^bits): integer
    multiply-then-divide, clamped at the edges."""
    span = int(hi) - int(lo) + 1
    if span <= 0:
        raise ValueError(f"empty dim range [{lo}, {hi}]")
    div = "div" if dialect == "spark" else "//"
    cells = 1 << bits
    return (
        f"LEAST({cells - 1}, GREATEST(0, "
        f"(({col_sql} - {int(lo)}) * {cells}) {div} {span}))"
    )


def zorder_sql(dims: list, bits: int, dialect: str) -> str:
    """The z-key as one SQL expression in the requested dialect
    (``spark`` | ``duckdb``): bit-interleave of the per-dim normalized
    cells, dimension d contributing its i-th bit at position
    ``i * n_dims + d``. Emitted from cell SUB-EXPRESSIONS repeated per
    bit — wrap in a CTE / intermediate projection (``with_zorder_key``
    does) when the optimizer's common-subexpression reuse matters."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect {dialect!r}")
    if bits * len(dims) > 63:
        raise ValueError(
            f"bits*len(dims) = {bits * len(dims)} > 63: the interleaved "
            "z-key would overflow the sign bit of a 64-bit long"
        )
    n_dims = len(dims)
    terms = []
    for d, (col_sql, lo, hi) in enumerate(dims):
        n = _norm_sql(col_sql, lo, hi, bits, dialect)
        for i in range(bits):
            j = i * n_dims + d
            if dialect == "spark":
                terms.append(f"shiftleft(shiftright({n}, {i}) & 1, {j})")
            else:
                terms.append(f"((({n} >> {i}) & 1) << {j})")
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(
    df: DataFrame, dims: list, bits: int = 8, out_col: str = "zkey"
) -> DataFrame:
    """Append the z-order key column. The normalized cells are computed
    ONCE in an intermediate projection (the interleave then references
    plain columns), keeping the expression tree linear in bits — all
    whole-stage codegen, no UDF."""
    norm_cols = []
    work = df
    for d, (col_sql, lo, hi) in enumerate(dims):
        nc = f"__z{d}"
        work = work.withColumn(
            nc, F.expr(_norm_sql(col_sql, lo, hi, bits, "spark")).cast("long")
        )
        norm_cols.append(nc)
    interleave = zorder_sql([(nc, 0, (1 << bits) - 1) for nc in norm_cols], bits, "spark")
    # the cells are already in [0, 2^bits): normalization of a cell by its
    # own full range is the identity, so reusing zorder_sql on the
    # projected cell columns interleaves them unchanged
    work = work.withColumn(out_col, F.expr(interleave).cast("long"))
    return work.drop(*norm_cols)


def zorder_file_assignment(
    df: DataFrame,
    dims: list,
    id_col: str,
    n_files: int,
    bits: int = 8,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic equal-height file assignment along the z-curve:
    ``file = rank_0based * n_files DIV n_rows`` with rank = exact global
    position by (zkey, id). Rank uses the two-phase device (range-bucket
    on the z-key's high bits → bounded per-bucket count collect →
    per-bucket windows + broadcast offsets) — no global window. Cell
    skew between buckets only unbalances TASKS, not the output files
    (equal-height by construction).

    Output: input columns + zkey + file (0-based int)."""
    if n_files <= 0:
        raise ValueError("n_files must be positive")
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError("n_buckets must be a power of two")
    if bits * len(dims) > 63:
        raise ValueError(
            f"bits*len(dims) = {bits * len(dims)} > 63: the interleaved "
            "z-key would overflow the sign bit of a 64-bit long"
        )
    keyed = with_zorder_key(df, dims, bits)
    n_dims = len(dims)
    total_bits = bits * n_dims
    shift = max(total_bits - (n_buckets.bit_length() - 1), 0)
    keyed = keyed.withColumn("__b", F.shiftright(F.col("zkey"), shift))
    offsets, n_rows = bucket_prefix_offsets(keyed, "__b")
    if n_rows == 0:
        # cast to long so the output schema matches the non-empty path's
        # integer-DIV expression
        return keyed.drop("__b").withColumn("file", F.lit(0).cast("long"))
    offset_map = offsets_map(offsets)
    w = Window.partitionBy("__b").orderBy("zkey", F.col(id_col))
    rank0 = (
        F.row_number().over(w) + offset_map[F.col("__b")].cast("long") - F.lit(1)
    ).cast("long")
    return (
        keyed.withColumn("__r", rank0)
        # integer DIV, not float division — exact at any row count
        .withColumn("file", F.expr(f"(__r * {int(n_files)}) div {n_rows}"))
        .drop("__b", "__r")
    )


def zorder_pruning_report(
    assigned: DataFrame,
    stat_cols: list,
    box: dict | None = None,
) -> DataFrame:
    """Per-file min/max statistics over ``stat_cols`` (a list of
    ``(col_sql, name)`` pairs) — the manifest-level stats a reader
    consults — plus, when ``box`` gives a predicate ({name: (lo, hi)}),
    whether file-level pruning would SCAN the file (bounding boxes
    intersect) and how many rows actually match inside it: the
    data-skipping effectiveness report. sum(would_scan)/n_files vs
    sum(n_match)/n_rows quantifies the layout's false-scan overhead.

    One map-combinable groupBy(file); the shuffle carries one row per
    (task, file)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for name, c in ((n, c) for c, n in stat_cols):
        aggs.append(F.min(F.expr(c)).cast("long").alias(f"min_{name}"))
        aggs.append(F.max(F.expr(c)).cast("long").alias(f"max_{name}"))
    if box:
        match = F.lit(True)
        for name, (lo, hi) in box.items():
            c = exprs_by_name(stat_cols, name)
            match = match & (F.expr(c) >= F.lit(lo)) & (F.expr(c) <= F.lit(hi))
        aggs.append(F.sum(match.cast("long")).cast("long").alias("n_match"))
    out = assigned.groupBy("file").agg(*aggs)
    if box:
        scan = F.lit(True)
        for name, (lo, hi) in box.items():
            scan = (
                scan
                & (F.col(f"min_{name}") <= F.lit(hi))
                & (F.col(f"max_{name}") >= F.lit(lo))
            )
        out = out.withColumn("would_scan", scan)
    return out


def exprs_by_name(stat_cols: list, name: str) -> str:
    for c, n in stat_cols:
        if n == name:
            return c
    raise KeyError(f"box predicate names unknown stat col {name!r}")


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list,
    id_col: str,
    n_files: int,
    bits: int = 8,
) -> None:
    """Materialize the layout: one directory per z-file so each parquet
    footer's min/max stats cover a compact hyper-rectangle. (On Iceberg
    the same assignment feeds a sort-order rewrite instead.)"""
    assigned = zorder_file_assignment(df, dims, id_col, n_files, bits)
    assigned.write.mode("overwrite").partitionBy("file").parquet(path)
