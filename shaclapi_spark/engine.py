"""The validation engine: shape sub-DAGs as declarative DataFrame plans.

Per-shape physical shape (SURVEY.md §7, scale-first):

  table ──filter(target)──► row-check columns (map-side, codegen)
        ──audio UDF column (Arrow batch; short-circuited by cheap checks)
        ──fk_exists marker joins (broadcast when parent keys are small)
        ──ONE groupBy(entity): n_rows + bool_and of every row bool   ← the
          only full-table shuffle, map-side combinable partial agg
        ──left join per (child_table, fk): child groupBy(fk) computing ALL
          count / qualified-valid-count columns for that child in one pass
        ──AND/OR combine + reason attribution (map-side)
        ──verdicts / violations

Shapes that declare no `unique` constraint are treated as entity-grain and
skip the groupBy entirely (zero-shuffle fast path — e.g. TranscriptShape).

Cyclic shape groups (tc3 analog) run to fixpoint from the all-valid
(unbound⇒valid) initialization; invalidation through qualified-min
constraints is monotone, and convergence is detected with a cheap
order-insensitive hash aggregate instead of a full diff.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from shaclapi_spark import verdicts as V
from shaclapi_spark.compiler import EvalGroup, compile_suite
from shaclapi_spark.ops import audio as audio_ops
from shaclapi_spark.ops import drift as drift_ops
from shaclapi_spark.ops import stats as stats_ops
from shaclapi_spark.ops.row_checks import describe, row_predicate
from shaclapi_spark.suite import (
    CHILD_KINDS,
    DATASET_KINDS,
    ROW_KINDS,
    Constraint,
    Shape,
    Suite,
)


@dataclass
class EngineConfig:
    n_buckets: int = 64
    short_circuit: bool = True          # early-fail: skip audio decode for rows already invalid
    max_fixpoint_iters: int = 10
    cache_shared_verdicts: bool = True  # persist verdicts reused by dependent shapes
    min_snr_db: float = 30.0
    # fk_match equality via xxhash64 of both sides: the parent agg and the
    # child-side join then shuffle fixed 8-byte hashes instead of raw payload
    # values (transcripts are ~100-300 B each — at 10^12 rows the raw-string
    # min/max shuffle IS the job). False-accept probability per comparison is
    # ~2^-64 (xxhash64 collision); set False for exact raw-value comparison.
    fk_match_by_hash: bool = True


@dataclass
class SuiteResult:
    verdicts: DataFrame
    violations: DataFrame
    summary: DataFrame
    shapes_evaluated: list[str] = field(default_factory=list)
    verdicts_by_shape: dict[str, DataFrame] = field(default_factory=dict)


def _bool_col(name: str) -> Column:
    return F.coalesce(F.col(name), F.lit(True))  # unbound ⇒ valid


class _ShapeEvaluator:
    """Builds the DataFrame plan for one shape given prerequisite verdicts."""

    def __init__(
        self,
        spark: SparkSession,
        shape: Shape,
        tables: dict[str, DataFrame],
        prereq_verdicts: dict[str, DataFrame],
        config: EngineConfig,
        entity_col_by_shape: dict[str, str] | None = None,
        population: DataFrame | None = None,
    ):
        self.spark = spark
        self.shape = shape
        self.tables = tables
        self.prereq = prereq_verdicts
        self.cfg = config
        self._ref_entity_cols = entity_col_by_shape or {}
        # entity-id restriction (one column `__pop_id`): validate only these
        # entities — the batch analog of the reference's replaced target query
        self.population = population
        self.row_cs: list[Constraint] = []
        self.audio_cs: list[Constraint] = []
        self.fk_cs: list[Constraint] = []
        self.child_cs: list[Constraint] = []
        self.unique_cs: list[Constraint] = []
        self.fdep_cs: list[Constraint] = []
        self.mono_cs: list[Constraint] = []
        self.dataset_cs: list[Constraint] = []
        self.or_groups: list[Constraint] = []
        self._classify()

    def _classify(self) -> None:
        def walk(c: Constraint) -> None:
            if c.kind == "or_group":
                for b in c.branches:
                    walk(b)
            elif c.kind == "audio_valid":
                self.audio_cs.append(c)
            elif c.kind in ("fk_exists", "fk_not_exists", "fk_match", "fk_near_match"):
                self.fk_cs.append(c)
            elif c.kind in ROW_KINDS:
                self.row_cs.append(c)
            elif c.kind == "unique":
                self.unique_cs.append(c)
            elif c.kind == "functional_dep":
                self.fdep_cs.append(c)
            elif c.kind == "monotonic":
                self.mono_cs.append(c)
            elif c.kind in CHILD_KINDS:
                self.child_cs.append(c)
            elif c.kind in DATASET_KINDS:
                self.dataset_cs.append(c)
            else:  # pragma: no cover
                raise ValueError(c.kind)

        for c in self.shape.constraints:
            if c.kind == "or_group":
                self.or_groups.append(c)
            walk(c)

    # ---- plan assembly ----------------------------------------------------

    def entity_bools(self) -> tuple[DataFrame, dict[str, Column]]:
        """Returns (entity-grain DF with one `b_<cid>` column per leaf
        constraint, {cid: entity-level bool Column})."""
        shape = self.shape
        df = self.tables[shape.table]
        if shape.target_filter:
            df = df.filter(F.expr(shape.target_filter))
        if self.population is not None:
            # entity-grain semi-join: ALL rows of each restricted entity
            # survive (a row filter would corrupt uniqueness/count semantics)
            df = df.join(
                self.population,
                df[shape.entity_col] == self.population["__pop_id"],
                "leftsemi",
            )

        # derived columns: derive-once-check-many — each SQL expression is
        # projected ONCE here, so constraints referencing it compile to a
        # plain column read instead of re-expanding the (possibly huge)
        # expression tree per constraint (measured 5x on the image suite,
        # whose container-header parse is ~100 expression nodes)
        for dname, dsql in (shape.derived_columns or {}).items():
            df = df.withColumn(dname, F.expr(dsql))

        # monotonic constraints re-aggregate the filtered source at
        # (entity, order_by) grain — capture it before the narrow projection
        # below drops their order/value columns
        mono_src = df if self.mono_cs else None

        top_level_ids = {c.id for c in shape.constraints}
        row_bool_names: list[str] = []
        precond_names: list[str] = []  # only top-level row checks may short-circuit
        for c in self.row_cs:
            name = f"b_{c.id}"
            df = df.withColumn(name, row_predicate(c))
            row_bool_names.append(name)
            if c.id in top_level_ids:
                precond_names.append(name)

        # audio UDF runs SCAN-SIDE, before any join/shuffle — the payload
        # bytes column is consumed here and pruned from everything downstream
        # (shuffling 10^12 audio blobs through a join would be the whole job).
        # Short-circuited by the cheap top-level row bools; parent-join bools
        # don't exist yet, so rows failing only an fk constraint do decode —
        # their entity verdict is already invalid either way, and the scan-side
        # placement is the 100-TB win.
        for c in self.audio_cs:
            name = f"b_{c.id}"
            pre = F.lit(True)
            if self.cfg.short_circuit:
                for rb in precond_names:
                    pre = pre & _bool_col(rb)
            df = audio_ops.with_audio_check(
                df,
                name,
                c.params["column"],
                float(c.params.get("min_snr_db", self.cfg.min_snr_db)),
                precondition=pre,
            )

        # child-side join keys that live on the shape's own table (inverse-path
        # refs, tc4 sh:inversePath analog) must survive the entity groupBy
        local_keys = sorted(
            {
                c.params.get("local_key")
                for c in self.child_cs
                if c.params.get("local_key") not in (None, shape.entity_col)
            }
        )

        # ---- narrow projection: everything after this point shuffles (parent
        # joins, entity groupBy) — keep only the entity id, join keys, the
        # fk_match comparison values (hashed to 8 bytes by default), and the
        # boolean columns. Payload columns (audio bytes, transcript text)
        # never cross a shuffle.
        fk_keys = set()
        for c in self.fk_cs:
            fk_keys.add(
                c.params["key"]
                if c.kind in ("fk_match", "fk_near_match")
                else c.params["column"]
            )
        keep = {shape.entity_col, *fk_keys, *local_keys}
        proj: list[Column] = [F.col(n) for n in sorted(keep)]
        match_col: dict[str, Column] = {}  # constraint id -> child-side value
        for c in self.fk_cs:
            if c.kind == "fk_near_match":
                # edit distance needs the raw chars — no hash shortcut;
                # the local text column rides to the parent join as-is
                if c.params["column"] not in keep:
                    keep.add(c.params["column"])
                    proj.append(F.col(c.params["column"]))
                match_col[c.id] = F.col(c.params["column"])
                continue
            if c.kind != "fk_match":
                continue
            raw = F.col(c.params["column"])
            if self.cfg.fk_match_by_hash:
                proj.append(
                    F.when(raw.isNotNull(), F.xxhash64(raw)).alias(f"__lh_{c.id}")
                )
                match_col[c.id] = F.col(f"__lh_{c.id}")
            else:
                if c.params["column"] not in keep:
                    keep.add(c.params["column"])
                    proj.append(raw)
                match_col[c.id] = raw
        # functional_dep carries xxhash64(column) (8 B per row) across the
        # entity groupBy instead of the raw value — constancy is decidable
        # from the hash alone (min==max), and payload-width columns
        # (transcripts) never cross the shuffle
        for c in self.fdep_cs:
            raw = F.col(c.params["column"])
            proj.append(
                F.when(raw.isNotNull(), F.xxhash64(raw)).alias(f"__fd_{c.id}")
            )
        # reconcile constraints: the parent-side integer `expected`
        # expression is computed scan-side (it reads payload-width parent
        # columns) and only the 8-byte result crosses the shuffles; with
        # duplicate entity rows the entity grain takes MAX (deterministic)
        rec_cs = [c for c in self.child_cs if c.kind == "reconcile"]
        for c in rec_cs:
            df = df.withColumn(
                f"__exp_{c.id}", F.expr(c.params["expected"]).cast("long")
            )
            proj.append(F.col(f"__exp_{c.id}"))
        all_row_names = row_bool_names + [f"b_{c.id}" for c in self.audio_cs]
        proj += [F.col(n) for n in all_row_names]
        df = df.select(*proj)

        # parent joins: fk_exists (marker) and fk_match (parent-value
        # equality) against the same parent/key are FUSED into one
        # aggregated-parent join — one shuffle per (parent, key) total
        by_parent: dict[tuple[str, str, str], list[Constraint]] = {}
        for c in self.fk_cs:
            p = c.params
            if c.kind in ("fk_match", "fk_near_match"):
                key = (p["parent"], p["key"], p["parent_key"])
            else:  # fk_exists / fk_not_exists share the aggregated-parent join
                key = (p["parent"], p["column"], p["parent_col"])
            by_parent.setdefault(key, []).append(c)
        for gi, ((parent_name, local_key, parent_key), cs) in enumerate(
            sorted(by_parent.items())
        ):
            parent = self.tables[parent_name]
            marker = f"__pex_{gi}"
            aggs = [F.count(F.lit(1)).alias(marker)]
            for c in cs:
                if c.kind == "fk_match":
                    # multi-parent semantics: the child value must equal EVERY
                    # parent row's (non-null) value — bool_and over parent
                    # rows, fused into the same single parent shuffle. Encoded
                    # with single-phase aggregates only (count/min/max — NOT
                    # count_distinct, whose partial-distinct expand doubles
                    # the shuffle over the big parent):  count == 0 ⇒ vacuous,
                    # min == max ⇒ exactly one distinct value ⇒ compare,
                    # min != max ⇒ >=2 distinct values ⇒ unsatisfiable.
                    # By default the aggregated value is xxhash64(parent_col):
                    # the parent shuffle carries 3×8 B per key instead of two
                    # raw payload values (see EngineConfig.fk_match_by_hash).
                    pv_raw = F.col(c.params["parent_col"])
                    pv_val = (
                        F.when(pv_raw.isNotNull(), F.xxhash64(pv_raw))
                        if self.cfg.fk_match_by_hash
                        else pv_raw
                    )
                    aggs.append(F.count(pv_val).alias(f"__pnn_{c.id}"))
                    aggs.append(F.min(pv_val).alias(f"__plo_{c.id}"))
                    aggs.append(F.max(pv_val).alias(f"__pv_{c.id}"))
                elif c.kind == "fk_near_match":
                    # edit-distance tolerance can't pre-reduce the parent
                    # side to min/max hashes — the raw values must meet the
                    # child string. collect_list (null-skipping, partial-agg
                    # mergeable) carries each key's parent values once; fk
                    # keys have bounded multiplicity so the list stays small
                    aggs.append(
                        F.collect_list(F.col(c.params["parent_col"])).alias(
                            f"__pl_{c.id}"
                        )
                    )
            pagg = parent.groupBy(
                F.col(parent_key).alias(f"__pjk_{gi}")
            ).agg(*aggs)
            df = df.join(
                pagg, df[local_key] == pagg[f"__pjk_{gi}"], "left"
            ).drop(f"__pjk_{gi}")
            for c in cs:
                name = f"b_{c.id}"
                if c.kind == "fk_exists":
                    b = F.when(
                        F.col(local_key).isNull(), F.lit(True)
                    ).otherwise(F.col(marker).isNotNull())
                elif c.kind == "fk_not_exists":
                    # blocklist semantics: valid iff the key hit NO parent row
                    b = F.when(
                        F.col(local_key).isNull(), F.lit(True)
                    ).otherwise(F.col(marker).isNull())
                elif c.kind == "fk_near_match":
                    lv = match_col[c.id]
                    pl = F.col(f"__pl_{c.id}")
                    max_edits = c.params.get("max_edits")
                    max_ppm = c.params.get("max_cer_ppm")

                    # NB: PySpark HOF lambdas must take exactly the HOF's
                    # arity — capture lv/k/ppm via closure, not defaults.
                    # F.forall consumes the lambda within this loop
                    # iteration, so late binding is safe.
                    def _near(v: Column) -> Column:
                        lv, k, ppm = match_col[c.id], max_edits, max_ppm
                        if ppm is None:
                            # absolute tolerance only: length-gap short
                            # circuit + thresholded levenshtein (O(k·len),
                            # returns -1 past the threshold — never O(n·m))
                            return (lv == v) | (
                                (
                                    F.abs(F.length(lv) - F.length(v))
                                    <= F.lit(int(k))
                                )
                                & (F.levenshtein(lv, v, int(k)) >= 0)
                            )
                        dist = F.when(lv == v, F.lit(0)).otherwise(
                            F.levenshtein(lv, v)
                        )
                        ok = (F.lit(1_000_000) * dist.cast("long")) <= (
                            F.lit(int(ppm)) * F.length(v).cast("long")
                        )
                        if k is not None:
                            ok = ok & (dist <= F.lit(int(k)))
                        return ok

                    b = F.when(
                        F.col(local_key).isNull()
                        | F.col(marker).isNull()
                        | lv.isNull()
                        | (F.size(pl) == 0),  # all parent values NULL ⇒ vacuous
                        F.lit(True),
                    ).otherwise(F.forall(pl, _near))
                else:
                    lv = match_col[c.id]
                    pv = F.col(f"__pv_{c.id}")
                    lo = F.col(f"__plo_{c.id}")
                    nn = F.col(f"__pnn_{c.id}")
                    b = F.when(
                        F.col(local_key).isNull()
                        | F.col(marker).isNull()
                        | lv.isNull()
                        | (nn == 0),  # all parent values NULL ⇒ vacuous
                        F.lit(True),
                    ).otherwise((lo == pv) & (lv == pv))
                df = df.withColumn(name, b)
                row_bool_names.append(name)
            df = df.drop(
                marker,
                *[f"__pv_{c.id}" for c in cs if c.kind == "fk_match"],
                *[f"__plo_{c.id}" for c in cs if c.kind == "fk_match"],
                *[f"__pnn_{c.id}" for c in cs if c.kind == "fk_match"],
                *[f"__lh_{c.id}" for c in cs if c.kind == "fk_match"],
                *[f"__pl_{c.id}" for c in cs if c.kind == "fk_near_match"],
            )

        all_row_names = row_bool_names + [f"b_{c.id}" for c in self.audio_cs]

        # entity-grain reduction: one shuffle, or zero if no uniqueness /
        # per-entity-constancy demanded (functional_dep rides the same
        # single groupBy as unique — min/max over the 8-byte value hash)
        entity = shape.entity_col
        grouped = bool(self.unique_cs or self.fdep_cs or self.mono_cs)
        if grouped:
            aggs = (
                [F.count(F.lit(1)).alias("__n_rows")]
                + [F.bool_and(F.col(n)).alias(n) for n in all_row_names]
                + [F.first(F.col(k)).alias(k) for k in local_keys]
            )
            for c in self.fdep_cs:
                aggs.append(F.min(F.col(f"__fd_{c.id}")).alias(f"__fdlo_{c.id}"))
                aggs.append(F.max(F.col(f"__fd_{c.id}")).alias(f"__fdhi_{c.id}"))
            for c in rec_cs:
                aggs.append(F.max(F.col(f"__exp_{c.id}")).alias(f"__exp_{c.id}"))
            ent = df.groupBy(F.col(entity).alias("entity_id")).agg(*aggs)
        else:
            ent = df.withColumn("__n_rows", F.lit(1)).withColumnRenamed(
                entity, "entity_id"
            )

        bools: dict[str, Column] = {c.id: F.col(f"b_{c.id}") for c in self.row_cs}
        bools.update({c.id: F.col(f"b_{c.id}") for c in self.fk_cs})
        bools.update({c.id: F.col(f"b_{c.id}") for c in self.audio_cs})
        for c in self.unique_cs:
            bools[c.id] = F.col("__n_rows") == 1
        for c in self.fdep_cs:
            lo, hi = F.col(f"__fdlo_{c.id}"), F.col(f"__fdhi_{c.id}")
            # min/max skip NULLs: lo NULL ⇒ all values NULL ⇒ vacuously
            # constant (not_null's job, not functional_dep's)
            bools[c.id] = lo.isNull() | (lo == hi)

        # child aggregates: one groupBy per (child table, fk, local join key),
        # all count columns for that child fused into the single pass
        by_child: dict[tuple[str, str, str], list[Constraint]] = {}
        for c in self.child_cs:
            lk = c.params.get("local_key") or shape.entity_col
            key = (c.params["child"], c.params["fk"], lk)
            by_child.setdefault(key, []).append(c)
        for (child_name, fk, local_key), cs in sorted(by_child.items()):
            child = self.tables[child_name]
            if self.population is not None and local_key == shape.entity_col:
                # population pushdown: don't aggregate child rows of parents
                # outside the restricted target set (semi-join prunes the
                # child scan before the groupBy shuffle)
                child = child.join(
                    self.population,
                    child[fk] == self.population["__pop_id"],
                    "leftsemi",
                )
            # (referenced shape, child column holding the referenced entity):
            # by default the child table IS the referenced shape's table, so
            # its entity column is the join key; `ref_key` overrides it for
            # edge-table children (e.g. SHACL graph links, shacl.LinkBinding)
            ref_pairs = sorted(
                {
                    (
                        c.params["shape"],
                        c.params.get("ref_key")
                        or self._ref_entity_col(c.params["shape"], child_name),
                    )
                    for c in cs
                    if c.kind == "qualified_shape"
                }
            )
            for rs, rk in ref_pairs:
                vd = self.prereq[rs].select(
                    F.col("entity_id").alias(f"__ve_{rs}_{rk}"),
                    F.col("is_valid").alias(f"__v_{rs}_{rk}"),
                )
                # verdict entity_id is string (output contract). For integral
                # child keys, cast the SMALL verdict side back to the native
                # type — the big child side then shuffles fixed-width 8-byte
                # keys instead of strings (verdict ids round-trip exactly:
                # they were produced by casting this very column to string).
                # Non-integral keys fall back to casting the child side.
                kt = dict(child.dtypes).get(rk, "string")
                if kt in ("bigint", "int", "smallint", "tinyint"):
                    vd = vd.withColumn(
                        f"__ve_{rs}_{rk}", F.col(f"__ve_{rs}_{rk}").cast(kt)
                    )
                    cond = child[rk] == vd[f"__ve_{rs}_{rk}"]
                else:
                    cond = child[rk].cast("string") == vd[f"__ve_{rs}_{rk}"]
                child = child.join(vd, cond, "left").drop(f"__ve_{rs}_{rk}")
            aggs = []
            for c in cs:
                cond = F.lit(True)
                if c.params.get("where"):
                    cond = F.coalesce(
                        F.expr(c.params["where"]).cast("boolean"), F.lit(False)
                    )
                if c.kind == "qualified_shape":
                    rs = c.params["shape"]
                    rk = c.params.get("ref_key") or self._ref_entity_col(
                        rs, child_name
                    )
                    cond = cond & F.coalesce(
                        F.col(f"__v_{rs}_{rk}"), F.lit(True)
                    )
                if c.kind == "reconcile":
                    amt = F.expr(c.params["amount"]).cast("long")
                    aggs.append(F.sum(F.when(cond, amt)).alias(f"sum_{c.id}"))
                else:
                    aggs.append(
                        F.sum(F.when(cond, 1).otherwise(0)).alias(f"cnt_{c.id}")
                    )
            agg = child.groupBy(F.col(fk).alias("__fk")).agg(*aggs)
            join_key = (
                ent["entity_id"]
                if local_key == shape.entity_col
                else ent[local_key]
            )
            ent = ent.join(agg, join_key == agg["__fk"], "left").drop("__fk")
            for c in cs:
                if c.kind == "reconcile":
                    dec = "decimal(38,0)"
                    exp = F.col(f"__exp_{c.id}")
                    act = F.coalesce(
                        F.col(f"sum_{c.id}"), F.lit(0).cast("long")
                    )
                    tol = int(c.params.get("tol_ppm", 0))
                    diff = F.abs(act.cast(dec) - exp.cast(dec))
                    bools[c.id] = exp.isNull() | (
                        diff * F.lit(1_000_000).cast(dec)
                        <= F.lit(tol).cast(dec) * F.abs(exp.cast(dec))
                    )
                    continue
                cnt = F.coalesce(F.col(f"cnt_{c.id}"), F.lit(0))
                pred = F.lit(True)
                if c.kind == "min_count" or (
                    c.kind == "qualified_shape" and c.params.get("min") is not None
                ):
                    pred = pred & (cnt >= F.lit(int(c.params["min"])))
                if c.kind == "max_count" or (
                    c.kind == "qualified_shape" and c.params.get("max") is not None
                ):
                    pred = pred & (cnt <= F.lit(int(c.params["max"])))
                bools[c.id] = pred

        # monotonic constraints: one (entity, order_key) pre-aggregate plus
        # one entity-window pass per distinct order_by column, every
        # constraint sharing that order key fused into the same pass.
        # Tie-robust semantics (suite.py docstring): per order-key group,
        # min(column) must be >= the running max(column) over all earlier
        # groups of the entity — i.e. SOME row ordering consistent with
        # order_by is non-decreasing in column. The pre-aggregate shuffles
        # only (entity, order_key, min, max) — payload columns never cross —
        # and the window + final entity rollup reuse its hash partitioning
        # on the entity key (no extra exchange: window partitionBy(entity)
        # ⊂ groupBy(entity, order_key) requires one repartition, then the
        # entity groupBy rides the window's partitioning).
        by_order: dict[str, list[Constraint]] = {}
        for c in self.mono_cs:
            by_order.setdefault(c.params["order_by"], []).append(c)
        for order_by, cs in sorted(by_order.items()):
            src = mono_src.filter(F.col(order_by).isNotNull())
            aggs = []
            for c in cs:
                v = F.col(c.params["column"])
                aggs.append(F.min(v).alias(f"__mlo_{c.id}"))
                aggs.append(F.max(v).alias(f"__mhi_{c.id}"))
            g = src.groupBy(
                F.col(entity).alias("__me"), F.col(order_by).alias("__mo")
            ).agg(*aggs)
            w = (
                Window.partitionBy("__me")
                .orderBy("__mo")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            for c in cs:
                lo = F.col(f"__mlo_{c.id}")
                prev = F.max(F.col(f"__mhi_{c.id}")).over(w)
                # NULL lo: the group's values are all NULL — ignored
                # (not_null's job); NULL prev: no earlier non-null value
                g = g.withColumn(
                    f"__mok_{c.id}", lo.isNull() | prev.isNull() | (lo >= prev)
                )
            ment = g.groupBy("__me").agg(
                *[
                    F.bool_and(F.col(f"__mok_{c.id}")).alias(f"__mono_{c.id}")
                    for c in cs
                ]
            )
            ent = ent.join(
                ment, ent["entity_id"] == ment["__me"], "left"
            ).drop("__me")
            for c in cs:
                # entities absent from the aggregate (every order key NULL)
                # are vacuously valid
                bools[c.id] = F.coalesce(
                    F.col(f"__mono_{c.id}"), F.lit(True)
                )

        return ent, bools

    def _ref_entity_col(self, ref_shape: str, child_table: str) -> str:
        """Join key for a qualified ref: the referenced shape's entity column
        (the referenced shape's table is the child table)."""
        return self._ref_entity_cols[ref_shape]

    def evaluate(self) -> tuple[DataFrame, DataFrame]:
        ent, bools = self.entity_bools()

        # top-level combine honoring or_groups, in declaration order
        top: list[tuple[Constraint, Column]] = []
        for c in self.shape.constraints:
            if c.kind in DATASET_KINDS:
                continue  # dataset-level, handled by the engine
            if c.kind == "or_group":
                col = F.lit(False)
                for b in c.branches:
                    col = col | F.coalesce(bools[b.id], F.lit(True))
                top.append((c, col))
            else:
                top.append((c, F.coalesce(bools[c.id], F.lit(True))))

        valid = F.lit(True)
        for _, col in top:
            valid = valid & col

        reason: Column = F.lit(None).cast("string")
        for c, col in reversed(top):
            rsn = (
                c.params["shape"] if c.kind == "qualified_shape" else c.id
            )
            reason = F.when(~col, F.lit(rsn)).otherwise(reason)

        ent = ent.withColumn("__valid", valid).withColumn("__reason", reason)

        verdicts = ent.select(
            F.col("entity_id").cast("string").alias("entity_id"),
            F.lit(self.shape.name).alias("shape"),
            F.col("__valid").alias("is_valid"),
            F.col("__reason").alias("reason"),
        )

        viol_structs = []
        for c, col in top:
            detail = F.lit(describe(c))
            if c.kind in ("min_count", "max_count", "qualified_shape"):
                detail = F.format_string(
                    "%s [count=%d]",
                    detail,
                    F.coalesce(F.col(f"cnt_{c.id}"), F.lit(0)),
                )
            elif c.kind == "unique":
                detail = F.format_string(
                    "%s [rows=%d]", detail, F.col("__n_rows")
                )
            viol_structs.append(
                F.when(
                    ~col,
                    F.struct(
                        F.lit(c.id).alias("constraint_id"),
                        detail.alias("detail"),
                    ),
                )
            )
        if viol_structs:
            arr = F.filter(F.array(*viol_structs), lambda x: x.isNotNull())
            violations = ent.select(
                F.col("entity_id").cast("string").alias("entity_id"),
                F.lit(self.shape.name).alias("shape"),
                F.explode(arr).alias("__v"),
            ).select(
                "entity_id",
                "shape",
                F.col("__v.constraint_id").alias("constraint_id"),
                F.col("__v.detail").alias("detail"),
            )
        else:
            violations = self.spark.createDataFrame([], schema="entity_id string, shape string, constraint_id string, detail string")
        return verdicts, violations


def _all_valid_verdicts(shape: Shape, tables: dict[str, DataFrame]) -> DataFrame:
    df = tables[shape.table]
    if shape.target_filter:
        df = df.filter(F.expr(shape.target_filter))
    return df.select(
        F.col(shape.entity_col).cast("string").alias("entity_id"),
        F.lit(shape.name).alias("shape"),
        F.lit(True).alias("is_valid"),
        F.lit("unbound").alias("reason"),
    ).dropDuplicates(["entity_id"])


def _verdict_fingerprint(vd: DataFrame) -> int:
    """Order-insensitive cheap convergence check for fixpoint iteration."""
    row = vd.select(
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col("entity_id"), F.col("is_valid"))), F.lit(0)
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return hash((int(row.h), int(row.n)))


def run_suite(
    spark: SparkSession,
    suite: Suite,
    tables: dict[str, DataFrame],
    target_shapes: list[str] | None = None,
    relevant_columns: set[str] | None = None,
    config: EngineConfig | None = None,
    prune: bool = True,
    preseeded_verdicts: dict[str, DataFrame] | None = None,
    target_population: "str | DataFrame | dict | None" = None,
    order_strategy: str = "heuristic",
    seed_shape: str | None = None,
    cyclic_seed_verdicts: DataFrame | None = None,
) -> SuiteResult:
    """Validate `tables` against `suite`; returns verdicts + violations +
    per-bucket summary for the target shapes (all shapes if None).

    ``preseeded_verdicts``: shape → verdict DF computed by an earlier run
    (lineage waves reuse helper-shape verdicts this way — the batch analog of
    the reference's early verdict reuse).

    ``target_population``: the batch analog of the reference's query-driven
    target-query replacement (Reduction.replace_target_query,
    ref shaclapi/reduction/Reduction.py:25-64 + shaclapi/query.py:194-244
    Query.intersect): restrict validation to the entities the caller's query
    names, intersected with each target shape's own target_filter. Either a
    SQL boolean over the target shape's table (an entity belongs to the
    population iff ANY of its rows satisfies it — every row of a selected
    entity is then validated, so uniqueness/count semantics are unchanged),
    or a single-column DataFrame of entity ids, or a dict mapping target
    shape name → either of those (per-shape restrictions; targets absent
    from the dict evaluate unrestricted — the incremental-revalidation path
    in revalidate.py uses this form). The restriction propagates
    to referenced helper shapes via (child, fk) semi-joins — helper verdicts
    are computed only for the child entities the restricted targets can
    reach; shapes inside cyclic groups stay unrestricted (fixpoint feedback
    makes per-population pruning unsafe there) UNLESS
    ``cyclic_seed_verdicts`` is provided.

    ``cyclic_seed_verdicts``: a verdict relation (entity_id, shape,
    is_valid, reason) from a prior run of the suite — the incremental-
    revalidation contract (revalidate.py). When every shape of a cyclic
    group has a population restriction, the group's fixpoint iterates ONLY
    over the restricted populations, with references to out-of-population
    entities answered from the seed verdicts. Soundness requires the
    populations to be CLOSED under the group's internal reference edges
    (every entity whose verdict can differ from the seed is inside them) —
    revalidate.affected_populations computes exactly that closure; with an
    unclosed population the carried seed verdicts may be stale. Without
    this argument (or without full population coverage of the group) the
    cyclic fixpoint runs unrestricted, as before.

    ``order_strategy`` / ``seed_shape``: see compiler.evaluation_order."""
    cfg = config or EngineConfig()
    targets = target_shapes or suite.names()
    reduced, groups = compile_suite(
        suite,
        targets,
        relevant_columns=relevant_columns,
        prune=prune,
        strategy=order_strategy,
        seed_shape=seed_shape,
    )
    _check_unique_ids(reduced)
    shape_by_name = {s.name: s for s in reduced.shapes}
    entity_col_by_shape = {s.name: s.entity_col for s in reduced.shapes}

    pop_by_shape: dict[str, DataFrame] = {}
    target_pops: dict[str, DataFrame] = {}
    if target_population is not None:
        pop_by_shape, target_pops = _propagate_population(
            reduced, groups, targets, target_population, tables
        )

    verdicts_by_shape: dict[str, DataFrame] = dict(preseeded_verdicts or {})
    violations_by_shape: dict[str, DataFrame] = {}

    def eval_one(
        name: str,
        prereq: dict[str, DataFrame],
        population: DataFrame | None = None,
    ):
        ev = _ShapeEvaluator(
            spark,
            shape_by_name[name],
            tables,
            prereq,
            cfg,
            entity_col_by_shape,
            population=(
                population if population is not None else pop_by_shape.get(name)
            ),
        )
        return ev.evaluate()

    for group in groups:
        if all(n in verdicts_by_shape for n in group.shapes):
            continue  # preseeded by an earlier run
        if not group.cyclic:
            name = group.shapes[0]
            vd, vl = eval_one(name, verdicts_by_shape)
            if cfg.cache_shared_verdicts and _is_referenced(reduced, name):
                vd = vd.persist()
            verdicts_by_shape[name] = vd
            violations_by_shape[name] = vl
        else:
            # seeded-restricted fixpoint (incremental revalidation): every
            # group shape restricted + a prior verdict relation supplied ⇒
            # iterate only over the affected populations; out-of-population
            # references answer from the (unchanged, by closure) seed
            seeded = cyclic_seed_verdicts is not None and all(
                n in target_pops for n in group.shapes
            )
            seed_outside: dict[str, DataFrame] = {}
            group_pop: dict[str, DataFrame] = {}
            if seeded:
                for n in group.shapes:
                    ids = target_pops[n].select(
                        F.col("__pop_id").cast("string").alias("__pop_id")
                    )
                    group_pop[n] = target_pops[n]
                    s_old = cyclic_seed_verdicts.filter(
                        F.col("shape") == F.lit(n)
                    ).select("entity_id", "shape", "is_valid", "reason")
                    # entities DELETED from the new version fall out of the
                    # population (it is new-table-intersected), so their
                    # stale verdicts would otherwise survive in the seed —
                    # a full run emits nothing for them and coalesces
                    # references to valid; restrict the seed to entities
                    # the NEW table still carries
                    sh = shape_by_name[n]
                    live = tables[sh.table]
                    if sh.target_filter:
                        live = live.filter(F.expr(sh.target_filter))
                    live_ids = live.select(
                        F.col(sh.entity_col).cast("string").alias("__live_id")
                    ).distinct()
                    seed_outside[n] = (
                        s_old.join(
                            ids,
                            s_old["entity_id"] == ids["__pop_id"],
                            "left_anti",
                        )
                        .join(
                            live_ids,
                            F.col("entity_id") == F.col("__live_id"),
                            "leftsemi",
                        )
                        .localCheckpoint(eager=True)
                    )

            def init_valid(n: str) -> DataFrame:
                av = _all_valid_verdicts(shape_by_name[n], tables)
                if not seeded:
                    return av
                ids = group_pop[n].select(
                    F.col("__pop_id").cast("string").alias("__pop_id")
                )
                return av.join(
                    ids, av["entity_id"] == ids["__pop_id"], "leftsemi"
                )

            # unbound ⇒ valid initialization, iterate to fixpoint
            current = {n: init_valid(n) for n in group.shapes}
            fps = {n: None for n in group.shapes}
            last_viol: dict[str, DataFrame] = {}
            for _ in range(cfg.max_fixpoint_iters):
                prereq = dict(verdicts_by_shape)
                for n in group.shapes:
                    prereq[n] = (
                        seed_outside[n].unionByName(current[n])
                        if seeded
                        else current[n]
                    )
                new = {}
                changed = False
                for n in group.shapes:
                    vd, vl = eval_one(
                        n, prereq, population=group_pop.get(n)
                    )
                    vd = vd.localCheckpoint(eager=True)
                    new[n] = vd
                    last_viol[n] = vl
                    fp = _verdict_fingerprint(vd)
                    if fps[n] != fp:
                        changed = True
                    fps[n] = fp
                current = new
                if not changed:
                    break
            for n in group.shapes:
                # seeded runs must publish the MERGED relation (seed for
                # unaffected entities ∪ fresh slice): downstream shapes
                # referencing into the cyclic group need verdicts for
                # entities outside the affected population too, or their
                # qualified_shape joins coalesce the gap to valid. The
                # post-loop target-population filter restricts what is
                # EMITTED back to the affected slice.
                verdicts_by_shape[n] = (
                    seed_outside[n].unionByName(current[n])
                    if seeded
                    else current[n]
                )
                violations_by_shape[n] = last_viol[n]

    # targets that had to evaluate unrestricted (cyclic groups, unrestricted
    # co-referrers) still emit only the requested population: post-filter
    # their verdict/violation outputs by the target population
    for name in targets:
        if (
            name in target_pops
            and name not in pop_by_shape
            and name in verdicts_by_shape
            and name not in (preseeded_verdicts or {})
        ):
            ids = target_pops[name].select(
                F.col("__pop_id").cast("string").alias("__pop_id")
            )
            for d in (verdicts_by_shape, violations_by_shape):
                if name in d:
                    d[name] = d[name].join(
                        ids, d[name]["entity_id"] == ids["__pop_id"], "leftsemi"
                    )

    # dataset-level constraints (any shape): drift + stat_bound, each fused
    # into one job per distinct (table, target_filter) source
    drift_vd, drift_vl = drift_ops.evaluate_drift_constraints(
        spark, reduced, tables
    )
    sb_vd, sb_vl = stats_ops.evaluate_stat_bound_constraints(
        spark, reduced, tables
    )

    keep = [n for n in verdicts_by_shape if n not in (preseeded_verdicts or {})]
    verdicts = V.union_all(
        [verdicts_by_shape[n] for n in keep]
        + [d for d in (drift_vd, sb_vd) if d is not None]
    )
    violations = V.union_all(
        [violations_by_shape[n] for n in keep]
        + [d for d in (drift_vl, sb_vl) if d is not None]
    )
    summary = V.summarize(verdicts, cfg.n_buckets)
    return SuiteResult(
        verdicts=verdicts,
        violations=violations,
        summary=summary,
        shapes_evaluated=keep,
        verdicts_by_shape=dict(verdicts_by_shape),
    )


def _propagate_population(
    reduced: Suite,
    groups: list[EvalGroup],
    targets: list[str],
    restriction: "str | DataFrame | dict",
    tables: dict[str, DataFrame],
) -> tuple[dict[str, DataFrame], dict[str, DataFrame]]:
    """(eval populations, raw target populations), both shape → entity-id
    DataFrame (column `__pop_id`), for the restricted run.

    Target shapes get the user restriction (∩ their own target_filter);
    referenced shapes get exactly the child entities reachable from a
    restricted parent through each qualified_shape's (child, fk) link —
    the semi-join-pushdown analog of the reference's per-shape query
    extension (ref shaclapi/config.py:326-331). Populations are persisted:
    each feeds 2-3 consumers (entity semi-join, child-agg pushdown,
    downstream propagation)."""
    shape_by_name = {s.name: s for s in reduced.shapes}
    entity_col_by_shape = {s.name: s.entity_col for s in reduced.shapes}

    target_pops: dict[str, DataFrame] = {}
    for name in targets:
        s = shape_by_name.get(name)
        if s is None:
            continue
        r = restriction.get(name) if isinstance(restriction, dict) else restriction
        if r is None:
            # dict form with no entry for this target: unrestricted — leave it
            # out of pops entirely so it evaluates (and emits) its full
            # population, exactly like a shape no caller asked to restrict
            continue
        df = tables[s.table]
        if s.target_filter:
            df = df.filter(F.expr(s.target_filter))
        if isinstance(r, str):
            df = df.filter(F.expr(r))
        else:
            ids = r.select(F.col(r.columns[0]).alias("__pop_id"))
            df = df.join(
                ids, df[s.entity_col] == ids["__pop_id"], "leftsemi"
            )
        target_pops[name] = (
            df.select(F.col(s.entity_col).alias("__pop_id")).distinct()
        )

    def walk_refs(c: Constraint):
        if c.kind == "qualified_shape":
            yield c
        for b in c.branches:
            yield from walk_refs(b)

    # dependents → prerequisites (groups is prerequisites-first ⇒ walk it
    # reversed, so every referrer's own status is final before it pushes a
    # need to its referenced shapes). A shape evaluates restricted only if
    # EVERY evaluated referrer is itself restricted (an unrestricted
    # referrer needs helper verdicts for its full population) and it is not
    # in a cyclic group (fixpoint feedback makes population pruning unsafe).
    pops: dict[str, DataFrame] = dict(target_pops)
    unrestricted: set[str] = set()
    for group in reversed(groups):
        for name in group.shapes:
            restricted_here = (
                name in pops and name not in unrestricted and not group.cyclic
            )
            if not restricted_here:
                unrestricted.add(name)
            s = shape_by_name[name]
            for c0 in s.constraints:
                for c in walk_refs(c0):
                    ref = c.params["shape"]
                    if not restricted_here or c.params.get("local_key") not in (
                        None,
                        s.entity_col,
                    ):
                        # unrestricted referrer, or an inverse-path link that
                        # joins on a non-entity local column: the referenced
                        # shape must cover its full population
                        unrestricted.add(ref)
                        continue
                    child = tables[c.params["child"]]
                    ref_col = c.params.get("ref_key") or entity_col_by_shape[ref]
                    need = (
                        child.join(
                            pops[name],
                            child[c.params["fk"]] == pops[name]["__pop_id"],
                            "leftsemi",
                        )
                        .select(F.col(ref_col).alias("__pop_id"))
                        .distinct()
                    )
                    pops[ref] = (
                        pops[ref].unionByName(need).distinct()
                        if ref in pops
                        else need
                    )
    for n in unrestricted:
        pops.pop(n, None)
    return {n: df.persist() for n, df in pops.items()}, target_pops


def _is_referenced(suite: Suite, name: str) -> bool:
    return any(name in s.shape_refs() for s in suite.shapes)


def _check_unique_ids(suite: Suite) -> None:
    seen: set[str] = set()

    def walk(c: Constraint) -> None:
        if c.id in seen:
            raise ValueError(f"duplicate constraint id {c.id!r}")
        seen.add(c.id)
        for b in c.branches:
            walk(b)

    for s in suite.shapes:
        for c in s.constraints:
            walk(c)
