"""Table-reference resolution — the engine's source layer.

The reference's only data source is a SPARQL endpoint scan
(shaclapi/multiprocessing/contactSource.py:10-73, SURVEY.md §2.1 S1/S2);
here the production source is a catalog table (the BASELINE input is an
Iceberg table of audio clip + transcript pairs), with parquet directories
as the test/sandbox stand-in.

A *table ref* is one of

* a parquet path (file or directory) — ``/data/clips.parquet``;
* an explicit URI ``parquet:/path``, ``iceberg:cat.db.clips``,
  ``table:db.clips`` (any catalog-registered table, e.g. Delta/Hive);
* an already-loaded :class:`DataFrame` (passed through).

Scale notes (100 TB): every branch below resolves to a declarative
``spark.read`` — Catalyst keeps predicate pushdown, column pruning, and
(for Iceberg/partitioned parquet) partition pruning intact downstream.
Nothing is collected or schema-inferred row-by-row. Iceberg additionally
gives snapshot-isolated scans + hidden-partition pruning; the engine never
relies on file layout, so swapping parquet → Iceberg is a ref change only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: table names the clip-validation suite expects (BASELINE input_hint)
CLIP_TABLES = ("clips", "transcripts", "ref_histograms")


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog can actually serve ``spark.read.table``.

    Checks that (a) the Iceberg Spark runtime classes are on the JVM
    classpath and (b) at least one ``spark.sql.catalog.*`` is configured.
    This sandbox ships no iceberg-spark-runtime jar, so the gate keeps the
    engine usable on plain parquet while production clusters (jar + catalog
    configured via spark-submit ``--packages``) take the Iceberg path.
    """
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    confs = spark.sparkContext.getConf().getAll()
    return any(k.startswith("spark.sql.catalog.") for k, _v in confs)


def read_table(spark: SparkSession, ref: "str | DataFrame") -> DataFrame:
    """Resolve one table ref to a DataFrame (see module docstring)."""
    if isinstance(ref, DataFrame):
        return ref
    if not isinstance(ref, str):
        raise TypeError(f"table ref must be str or DataFrame, got {type(ref)}")
    scheme, _, rest = ref.partition(":")
    if _ and scheme == "parquet":
        return spark.read.parquet(rest)
    if _ and scheme == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                f"iceberg ref {ref!r} but no Iceberg runtime/catalog is "
                "configured — add iceberg-spark-runtime to --packages and "
                "set spark.sql.catalog.<name> (sandbox fallback: parquet refs)"
            )
        return spark.read.table(rest)
    if _ and scheme == "table":
        # any catalog-registered table: Hive/Delta/Iceberg/temp view
        return spark.read.table(rest)
    if _ and scheme not in ("file", "hdfs", "s3", "s3a", "gs", "abfs"):
        raise ValueError(f"unknown table-ref scheme {scheme!r} in {ref!r}")
    return spark.read.parquet(ref)


def load_tables(
    spark: SparkSession,
    source: "str | dict[str, str | DataFrame]",
    names: "tuple[str, ...] | None" = None,
) -> dict[str, DataFrame]:
    """Resolve a whole input set for :func:`shaclapi_spark.api.run`.

    ``source`` is either a directory (every ``<name>.parquet`` child with
    ``name`` in ``names`` — default: any — becomes a table) or an explicit
    ``{name: ref}`` mapping of per-table refs.
    """
    if isinstance(source, dict):
        return {n: read_table(spark, r) for n, r in source.items()}
    if not os.path.isdir(source):
        raise FileNotFoundError(f"table directory not found: {source}")
    out: dict[str, DataFrame] = {}
    for entry in sorted(os.listdir(source)):
        if not entry.endswith(".parquet"):
            continue
        name = entry[: -len(".parquet")]
        if names is not None and name not in names:
            continue
        out[name] = spark.read.parquet(os.path.join(source, entry))
    if not out:
        raise FileNotFoundError(f"no *.parquet tables under {source}")
    return out
