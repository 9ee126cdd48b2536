"""Deterministic synthetic fixtures per FIXTURES.md (T1 clips / T2 transcripts / T3 histograms).

Mirrors the reference's golden test corpus layout (index-modular patterns like
/root/reference/tests/tc4/docs/TC4_preparation.txt's nodeA_0..nodeA_19) recast
onto the BASELINE.json ``input_hint`` schema. Every column is a pure function
of the row index, so generation is deterministic under any partitioning and
reproducible at any scale — the generator is Spark-native (``spark.range`` +
built-in functions; the binary audio payload is the only Arrow-UDF stage).

Violation seeds (FIXTURES.md):
  clips:        i %  997 == 0  -> duplicated clip_id (uniqueness)
                i %  101 == 0  -> bit-corrupted payload (SNR < 30 dB)
                i %   89 == 0  -> sr_hz = 0 (range)
                i %  127 == 0  -> sr_hz NULL (null-rate)
                i %   13 == 0  -> transcript NULL (min-count via T1 column)
                i >= 0.9 * N   -> dur_ms shifted +15000 (drift + range)
  transcripts:  j %   31 == 0  -> dangling clip_id (referential)
                j %   41 == 0  -> mutated text (exact-equality invariant)
                j %   23 == 0  -> n_tokens = -1 (min-value)
  cardinality:  clip i owns i % 4 transcript rows (0 -> min-count violation,
                2,3 -> max-count-1 violation) — tc5 ladder analog.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from shaclapi_spark import audio_codec

SR_CYCLE = [8000, 16000, 22050, 44100, 48000]
CODEC_BY_MOD10 = ["opus"] * 7 + ["flac"] * 2 + ["pcm_s16le"]
LANG_CYCLE = ["en", "de", "es"]

CLIPS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("sr_hz", IntegerType()),
        StructField("dur_ms", IntegerType()),
        StructField("codec", StringType()),
        StructField("transcript", StringType()),
    ]
)

# internal wide schema carrying the row index into the payload-synth stage
_GEN_SCHEMA = StructType(
    [StructField("i", LongType())]
    + [f for f in CLIPS_SCHEMA.fields if f.name != "bytes"]
)


def _clip_meta_df(spark: SparkSession, n_clips: int) -> DataFrame:
    """All metadata columns (everything but bytes), JVM-side only."""
    shift_from = int(0.9 * n_clips)
    df = spark.range(0, n_clips, 1).withColumnRenamed("id", "i")
    # uniqueness violations: rows i % 997 == 0 appear twice; the duplicate
    # carries a CONFLICTING transcript value (exercises fk_match's
    # multi-parent bool_and semantics: disagreeing parent rows ⇒ no child
    # value can match them all)
    df = df.withColumn("__dup", F.lit(False))
    dup = df.filter((F.col("i") % 997) == 0).withColumn("__dup", F.lit(True))
    df = df.unionAll(dup)
    sr_nominal = F.element_at(
        F.array(*[F.lit(v) for v in SR_CYCLE]), (F.col("i") % 5 + 1).cast("int")
    )
    sr = (
        F.when(F.col("i") % 127 == 0, F.lit(None).cast("int"))
        .when(F.col("i") % 89 == 0, F.lit(0))
        .otherwise(sr_nominal)
        .cast("int")
    )
    dur = (F.lit(500) + (F.col("i") * 37) % 29500) + F.when(
        F.col("i") >= shift_from, F.lit(15000)
    ).otherwise(F.lit(0))
    codec = F.element_at(
        F.array(*[F.lit(c) for c in CODEC_BY_MOD10]), (F.col("i") % 10 + 1).cast("int")
    )
    transcript = F.when(F.col("i") % 13 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit("transcript of clip "),
            F.col("i").cast("string"),
            F.when(F.col("__dup"), F.lit(" (alt)")).otherwise(F.lit("")),
        )
    )
    return df.select(
        F.col("i"),
        F.format_string("clip_%08d", F.col("i")).alias("clip_id"),
        sr.alias("sr_hz"),
        dur.cast("int").alias("dur_ms"),
        codec.alias("codec"),
        transcript.alias("transcript"),
    )


def _synth_bytes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched payload synthesis: i -> SGA1 blob (numpy per clip)."""
    for pdf in batches:
        ii = pdf["i"].to_numpy()
        blobs = []
        for i in ii:
            i = int(i)
            freq = 220.0 + (i % 32) * 55.0
            sr = SR_CYCLE[i % 5]  # header sr is always the nominal (valid) rate
            n_samples = 256 + (i % 256)
            codec = CODEC_BY_MOD10[i % 10]
            blobs.append(
                audio_codec.encode_clip(
                    freq, sr, n_samples, 0.8, codec, corrupt=(i % 101 == 0)
                )
            )
        out = pdf.copy()
        out["bytes"] = blobs
        yield out[["i", "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]]


def clips_df(spark: SparkSession, n_clips: int, with_bytes: bool = True) -> DataFrame:
    """The T1 clips table at the exact ``input_hint`` schema."""
    meta = _clip_meta_df(spark, n_clips)
    if not with_bytes:
        return meta.select(
            "clip_id",
            F.lit(None).cast("binary").alias("bytes"),
            "sr_hz",
            "dur_ms",
            "codec",
            "transcript",
        )
    gen_schema = StructType([StructField("i", LongType())] + CLIPS_SCHEMA.fields)
    wide = meta.mapInPandas(_synth_bytes, schema=gen_schema)
    return wide.select([f.name for f in CLIPS_SCHEMA.fields])


# ---------------------------------------------------------------------------
# T2 transcripts: clip i owns i % 4 rows; global transcript index j is the
# closed-form prefix sum  j_base(i) = 6*(i//4) + [0,0,1,3][i%4]  (+ r).
# ---------------------------------------------------------------------------

def transcripts_df(spark: SparkSession, n_clips: int) -> DataFrame:
    df = spark.range(0, n_clips, 1).withColumnRenamed("id", "i")
    k = (F.col("i") % 4).cast("int")
    j_base = (F.col("i") / 4).cast("long") * 6 + F.element_at(
        F.array(F.lit(0), F.lit(0), F.lit(1), F.lit(3)), (F.col("i") % 4 + 1).cast("int")
    )
    df = (
        df.withColumn("k", k)
        .filter(F.col("k") > 0)
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.col("k") - 1)))
        .withColumn("j", (j_base + F.col("r")).cast("long"))
    )
    clip_id = F.when(
        F.col("j") % 31 == 0, F.format_string("clip_missing_%d", F.col("j"))
    ).otherwise(F.format_string("clip_%08d", F.col("i")))
    text = F.when(
        F.col("j") % 41 == 0, F.format_string("MUTATED %d", F.col("j"))
    ).otherwise(F.concat(F.lit("transcript of clip "), F.col("i").cast("string")))
    df = df.select(
        F.format_string("tr_%08d", F.col("j")).alias("transcript_id"),
        clip_id.alias("clip_id"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANG_CYCLE]), (F.col("j") % 3 + 1).cast("int")
        ).alias("lang"),
        F.col("j"),
    )
    # n_tokens derives from the materialized text (mutated text has 2 tokens)
    return df.select(
        "transcript_id",
        "clip_id",
        "text",
        "lang",
        F.when(F.col("j") % 23 == 0, F.lit(-1))
        .otherwise(F.size(F.split(F.col("text"), " ")))
        .cast("int")
        .alias("n_tokens"),
    )


def reference_histograms_pdf(n_bins: int = 32) -> pd.DataFrame:
    """T3 drift baseline: expected bin fractions of the *unshifted* generator."""
    rows = []
    # dur_ms unshifted: 500 + (i*37) % 29500 — uniform over [500, 30000)
    lo, hi = 500.0, 30000.0
    edges = np.linspace(lo, hi, n_bins + 1)
    for b in range(n_bins):
        rows.append(("dur_ms", float(edges[b]), float(edges[b + 1]), 1.0 / n_bins))
    # sr_hz: five discrete rates, 1/5 mass each (nulls/zeros excluded from drift)
    lo, hi = 8000.0, 48000.0
    edges = np.linspace(lo, hi, n_bins + 1)
    frac = np.zeros(n_bins)
    for v in SR_CYCLE:
        b = min(int((v - lo) / (hi - lo) * n_bins), n_bins - 1)
        frac[b] += 1.0 / len(SR_CYCLE)
    for b in range(n_bins):
        rows.append(("sr_hz", float(edges[b]), float(edges[b + 1]), float(frac[b])))
    return pd.DataFrame(rows, columns=["column_name", "bin_lo", "bin_hi", "ref_frac"])


def ensure_fixture(spark: SparkSession, out_dir: str, n_clips: int) -> dict[str, str]:
    """Idempotently materialize clips/transcripts/ref_histograms parquet.

    Returns {table_name: path}. Paths are stable so DuckDB oracles can read
    the very same files the Spark queries read.
    """
    paths = {
        "clips": os.path.join(out_dir, "clips.parquet"),
        "transcripts": os.path.join(out_dir, "transcripts.parquet"),
        "ref_histograms": os.path.join(out_dir, "ref_histograms.parquet"),
    }
    marker = os.path.join(out_dir, f"_FIXTURE_OK_{n_clips}")
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    # bound row groups to ~32 MB: Spark splits parquet scans only at
    # row-group boundaries, and the writer's default ~128 MB groups come out
    # bimodal (a ~170k-row group + a remainder group per file), which (a)
    # floors the scan-task size at ~130 MB regardless of
    # spark.sql.files.maxPartitionBytes and (b) gives the audio-decode stage
    # 2x task skew. 32 MB groups let the scan split into uniform tasks sized
    # by maxPartitionBytes alone — the decode stage's wave count at high core
    # counts is what the N→4N scaling ratio is most sensitive to.
    clips_df(spark, n_clips).write.option(
        "parquet.block.size", 32 * 1024 * 1024
    ).mode("overwrite").parquet(paths["clips"])
    transcripts_df(spark, n_clips).write.option(
        "parquet.block.size", 32 * 1024 * 1024
    ).mode("overwrite").parquet(paths["transcripts"])
    ref = reference_histograms_pdf()
    spark.createDataFrame(ref).coalesce(1).write.mode("overwrite").parquet(
        paths["ref_histograms"]
    )
    with open(marker, "w") as fh:
        fh.write(str(n_clips))
    return paths


def fixture_n_clips(sf_dir: str) -> int:
    """Scale-factor → clip count (sf0.001→2k, sf0.01→20k, sf0.1→200k)."""
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.01
    return max(2000, int(round(sf * 2_000_000)))
