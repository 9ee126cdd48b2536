"""Checkpointed per-partition lineage: incremental waves + idempotent resume.

The reference delivers results *anytime* (tuples stream out while validation
runs — shaclapi/multiprocessing/functions.py:77-83) but has zero
resumability (SURVEY.md §4.2: a failed run restarts from scratch). The batch
recast mandated by the north rule is: split the target-entity space into
deterministic hash buckets, process bucket-waves independently, write each
wave's verdicts/violations/summary to parquet *then* append a manifest row.
A rerun reads the manifest and skips completed waves — exactly-once output
under at-least-once execution, because the wave id (not the Spark task) is
the unit of commit and bucket membership is a pure function of entity_id.

Helper-shape verdicts are computed once per run and shared across waves
(they are inputs to every wave's qualified-shape joins), mirroring the
reference's early verdict reuse.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import Observation, SparkSession, functions as F

from shaclapi_spark import verdicts as V
from shaclapi_spark.engine import EngineConfig, run_suite
from shaclapi_spark.metrics import MetricsRecorder
from shaclapi_spark.suite import Suite


@dataclass
class LineageRun:
    out_dir: str
    n_waves: int
    completed: list[int]
    ran: list[int]
    wall_sec: float
    # anytime-delivery metric: seconds until the first verdict wave was
    # durably written (None when every wave was already complete on entry)
    first_verdict_sec: float | None = None


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.jsonl")


def completed_waves(out_dir: str) -> set[int]:
    path = _manifest_path(out_dir)
    done: set[int] = set()
    if os.path.exists(path):
        with open(path) as fh:
            for line in fh:
                rec = json.loads(line)
                if rec.get("status") == "done":
                    done.add(int(rec["wave"]))
    return done


def run_with_lineage(
    spark: SparkSession,
    suite: Suite,
    tables,
    target_shape: str,
    out_dir: str,
    n_waves: int = 8,
    config: EngineConfig | None = None,
) -> LineageRun:
    """Validate `target_shape` in `n_waves` hash-bucket waves with a resume
    manifest. Output layout: {out_dir}/verdicts/wave=K/, violations/wave=K/,
    summary/wave=K/, _manifest.jsonl."""
    cfg = config or EngineConfig()
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    done = completed_waves(out_dir)
    shape = suite.shape(target_shape)
    entity = shape.entity_col

    # dataset-level drift checks are whole-table statements — meaningless per
    # hash-wave; the caller runs them once via run_suite on the full input
    from shaclapi_spark.suite import Shape, Suite as _Suite

    wave_shapes = []
    for s in suite.shapes:
        wave_shapes.append(
            Shape(
                name=s.name,
                table=s.table,
                entity_col=s.entity_col,
                target_filter=s.target_filter,
                constraints=[c for c in s.constraints if c.kind != "drift"],
                derived_columns=s.derived_columns,
            )
        )
    wave_suite = _Suite(shapes=wave_shapes)

    # waves partition the TARGET entity space only; a target inside a shape
    # cycle would need cross-wave fixpoints — run those via run_suite instead
    from shaclapi_spark.compiler import evaluation_order

    for g in evaluation_order(wave_suite):
        if g.cyclic and target_shape in g.shapes:
            raise ValueError(
                f"target shape {target_shape!r} is in a cyclic group "
                f"{g.shapes}; incremental waves require an acyclic target"
            )

    # helper-shape verdicts: computed ONCE, cached, reused by every wave
    helper_names = [n for n in wave_suite.names() if n != target_shape]
    preseeded = {}
    if helper_names:
        helper_res = run_suite(
            spark, wave_suite, tables, target_shapes=helper_names, config=cfg
        )
        preseeded = {
            n: df.persist()
            for n, df in helper_res.verdicts_by_shape.items()
            if n != target_shape
        }

    rec = MetricsRecorder(run_id=f"lineage-{target_shape}-{int(t0)}")
    ran: list[int] = []
    for wave in range(n_waves):
        if wave in done:
            continue
        # bucket filter is a pure function of the entity id → pushed into the
        # scan; all non-target rows are dropped before any shuffle
        wave_pred = (
            F.pmod(F.xxhash64(F.col(entity)), F.lit(n_waves)).cast("int") == wave
        )
        wave_tables = dict(tables)
        wave_tables[shape.table] = tables[shape.table].filter(wave_pred)
        with rec.stage(f"wave_{wave}") as h:
            res = run_suite(
                spark,
                wave_suite,
                wave_tables,
                target_shapes=[target_shape],
                config=cfg,
                preseeded_verdicts=preseeded,
            )
            # row count piggybacks on the write job via the Observation API —
            # no extra count job, no re-read of the just-written parquet
            obs = Observation(f"lineage_wave_{wave}")
            res.verdicts.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, "verdicts", f"wave={wave}"))
            res.violations.write.mode("overwrite").parquet(
                os.path.join(out_dir, "violations", f"wave={wave}")
            )
            res.summary.write.mode("overwrite").parquet(
                os.path.join(out_dir, "summary", f"wave={wave}")
            )
            n_rows = int(obs.get["n"])
            h.record_rows(n_rows)
        # first-emission latency: how long until the FIRST verdict wave was
        # durably available to a consumer (anytime-delivery metric, the
        # analog of the reference's first-result timestamp)
        rec.mark_first("first_verdict_sec", since_ts=t0, n_rows=n_rows)
        # per-answer trace row (cumulative verdicts delivered vs offset)
        rec.mark_emission(since_ts=t0, n_rows=n_rows)
        with open(_manifest_path(out_dir), "a") as fh:
            fh.write(
                json.dumps(
                    {
                        "wave": wave,
                        "status": "done",
                        "ts": time.time(),
                        "target_shape": target_shape,
                    }
                )
                + "\n"
            )
        ran.append(wave)
    if rec.rows:
        rec.append_parquet(spark, os.path.join(out_dir, "metrics"))
    if rec.trace:
        rec.append_trace_parquet(spark, os.path.join(out_dir, "trace"))
    return LineageRun(
        out_dir=out_dir,
        n_waves=n_waves,
        completed=sorted(done | set(ran)),
        ran=ran,
        wall_sec=time.time() - t0,
        first_verdict_sec=rec.get("first_verdict_sec"),
    )


def read_all(spark: SparkSession, out_dir: str, what: str = "verdicts"):
    return spark.read.parquet(os.path.join(out_dir, what, "wave=*"))
