"""shaclapi_spark — a PySpark-native schema + constraint validation engine.

A from-scratch rebuild of the *capabilities* of SDM-TIB/shaclAPI
(/root/reference) on Spark DataFrames: shape schemas (target definition +
cardinality / referential / value constraints, possibly cyclic) are compiled
to a DAG of DataFrame constraint operators producing per-entity
(entity_id, shape, is_valid, reason) verdicts, per-partition pass/fail
summaries and violation rows keyed (entity_id, constraint_id).

Nothing here is a translation of the reference's process/queue engine
(shaclapi/multiprocessing/*): joins, spilling, scheduling and parallelism are
delegated to Catalyst/AQE; only the *semantics* (shape networks, verdict
rules, reduction heuristics — SURVEY.md §2, §4) are preserved.
"""

from shaclapi_spark.suite import (  # noqa: F401
    Constraint,
    Shape,
    Suite,
)
from shaclapi_spark.engine import run_suite  # noqa: F401
from shaclapi_spark.sources import load_tables, read_table  # noqa: F401

__version__ = "0.1.0"
