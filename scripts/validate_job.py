"""spark-submit entry point: validate the clips fixture with the full
constraint suite and print one JSON line with wall time + clips/sec.

Packaged per the north rule: run via

  spark-submit --master local[N] --py-files shaclapi_spark.zip \\
      scripts/validate_job.py --fixture-dir .bench_fixtures/nX --threads N

The fixture must be pre-materialized (scripts/scaling_bench.py does this)
so the measurement covers validation only, not data synthesis.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture-dir", required=True)
    ap.add_argument("--threads", type=int, required=True)
    ap.add_argument("--include-audio", default="1")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    shuffle = args.shuffle_partitions or max(8, args.threads * 2)
    spark = (
        SparkSession.builder.appName(f"clip-validate-{args.threads}")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # the bench fixture is ~0.6 GB; the default 128 MB maxPartitionBytes
        # bin-packs the scan into ~5 partitions, capping the Arrow-UDF stage
        # at 5 cores regardless of cluster size. Size file partitions so every
        # core gets work (at real cluster scale the input is TBs and the
        # default is fine — this is small-input tuning, same lever either way)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from shaclapi_spark import fixtures
    from shaclapi_spark.engine import EngineConfig, run_suite

    tables = {
        name: spark.read.parquet(f"{args.fixture_dir}/{name}.parquet")
        for name in ("clips", "transcripts", "ref_histograms")
    }
    n_clips = tables["clips"].count()  # warms the scan; excluded from timing

    suite = fixtures.clip_suite(
        include_audio=args.include_audio == "1", include_drift=False
    )
    t0 = time.time()
    res = run_suite(spark, suite, tables, config=EngineConfig(short_circuit=True))
    res.verdicts.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "threads": args.threads,
                "n_clips": n_clips,
                "wall_sec": round(wall, 3),
                "clips_per_sec": round(n_clips / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
