"""Constraint-suite model — the analog of the reference's shape schema.

The reference declares shapes in JSON/Turtle (sh:targetClass/sh:targetQuery,
sh:minCount/sh:maxCount, sh:qualifiedValueShape, sh:or — pinned in
/root/reference/tests/tc1..tc6 and the constraint classes asserted in
/root/reference/tests/test_main.py:296-403). Here a suite is a plain Python /
JSON document: shapes over named tables, each a conjunction of constraints,
possibly referencing other shapes (cycles allowed, tc3 analog).

Constraint kinds
----------------
row-level (pure map-side, no shuffle):
  not_null(column)                — sh:minCount 1 on a direct property
  range(column, min, max)         — value range (inclusive bounds, either side optional)
  in_set(column, values)          — sh:in analog
  regex(column, pattern)          — sh:pattern analog
  expr(sql)                       — arbitrary SQL boolean over the row
  audio_valid(column, min_snr_db) — decoded-PCM SNR gate (Arrow UDF, ops/audio.py)
  or_group(branches)              — sh:or: disjunction of the above kinds

entity-level (fused into ONE groupBy per shape):
  unique(column?)                 — clip_id uniqueness: exactly one row per entity
  functional_dep(column)          — the column is constant within each entity
        (all non-null values equal; ignores nulls — not_null's job). The
        per-entity reduction carries xxhash64(column) (8 B), never the raw
        value, and rides the same single entity groupBy as `unique`.
  monotonic(order_by, column)     — within each entity, `column` is
        non-decreasing when rows are ordered by `order_by` (ingestion-order
        vs event-time consistency, segment-offset ordering). Tie-robust:
        rows sharing an `order_by` value may be emitted in any order, so the
        check is "SOME ordering consistent with order_by is non-decreasing
        in column" — per (entity, order_by) group, min(column) must be ≥ the
        running max(column) over all earlier groups. NULL column values and
        NULL order keys are ignored (not_null's job); entities with < 2
        effective rows are vacuously valid.

child-level (one groupBy+join per (child_table, fk)):
  min_count / max_count(child, fk, where?)   — sh:minCount/maxCount over a path
  fk_exists(column, parent, parent_col)      — referential integrity
  fk_not_exists(column, parent, parent_col)  — blocklist / disjointness: the
        value must NOT appear in the parent relation (quarantine lists,
        retracted-consent ids, benchmark-id exclusion). NULL local value is
        vacuously valid. Fuses into the same aggregated-parent join as
        fk_exists against the same (parent, parent_col).
  reconcile(child, fk, expected, amount, tol_ppm?, where?, local_key?) —
        aggregate reconciliation: this entity's integer ``expected`` SQL
        expression (over its own row, e.g. round(total*100)) must equal the
        SUM of the child rows' integer ``amount`` expression within
        ``tol_ppm`` millionths of |expected| (default 0 = exact). Childless
        entities reconcile against 0; NULL expected is vacuously valid.
        Declare the parent columns the expression reads via ``columns`` so
        query-driven constraint pruning sees them. Fuses into the same
        single child groupBy as min/max_count on the same (child, fk).
  fk_match(key, parent, parent_key, column, parent_col) — cross-table value
        equality: this row's `column` must equal EVERY matching parent
        row's `parent_col` (bool_and over parent rows; when duplicated
        parent keys disagree the constraint is unsatisfiable). Vacuous when
        the local value is NULL, no parent row exists, or all parent values
        are NULL — those are not_null's / fk_exists's jobs. The BASELINE
        per-row invariant 'transcript equality' (input_hint) is this kind.
  fk_near_match(key, parent, parent_key, column, parent_col,
                max_edits? , max_cer_ppm?) — edit-distance-tolerant
        fk_match: this row's `column` must be within Levenshtein distance
        ``max_edits`` (absolute) and/or ``max_cer_ppm`` (normalized:
        1e6*dist <= ppm*len(parent value), exact integer arithmetic) of
        EVERY matching parent row's non-null `parent_col` (ASR-tolerance
        analog of the exact-equality invariant). Vacuous in the same cases
        as fk_match. Unlike fk_match the raw strings must meet, so the
        parent shuffle carries collect_list(parent_col) per key — assume
        bounded parent multiplicity per key (true of any fk); with
        max_edits only, the distance uses the thresholded levenshtein
        (O(k·len) not O(len²)) plus a length-gap short-circuit.
  qualified_shape(child, fk, shape, min, max?) — sh:qualifiedValueShape +
        qualifiedMin/MaxCount: count of child rows VALID for `shape`

dataset-level:
  drift(column, max_psi?, max_ks?)  — KS/PSI vs the broadcast reference
        histogram table (T3); verdict entity_id = '__dataset__'
  stat_bound(metric, min?, max?, columns?) — an aggregate SQL metric over the
        shape's (filtered) table must land inside [min, max]: null-rate /
        row-count / cardinality / central-tendency bounds (the north-star's
        per-column stats as first-class constraints, not just a report).
        All stat_bound constraints over the same source run in ONE fused
        aggregate job; a NULL metric (empty source) is vacuously valid.
        `columns` optionally names the table columns the metric reads, for
        query-driven constraint pruning.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

ROW_KINDS = {"not_null", "range", "in_set", "regex", "expr", "audio_valid"}
ENTITY_KINDS = {"unique", "functional_dep", "monotonic"}
CHILD_KINDS = {
    "min_count",
    "max_count",
    "fk_exists",
    "fk_not_exists",
    "fk_match",
    "fk_near_match",
    "qualified_shape",
    "reconcile",
}
DATASET_KINDS = {"drift", "stat_bound"}
ALL_KINDS = ROW_KINDS | ENTITY_KINDS | CHILD_KINDS | DATASET_KINDS | {"or_group"}


@dataclass
class Constraint:
    id: str
    kind: str
    params: dict = field(default_factory=dict)
    branches: list["Constraint"] = field(default_factory=list)  # or_group only

    def __post_init__(self) -> None:
        if self.kind not in ALL_KINDS:
            raise ValueError(f"unknown constraint kind {self.kind!r}")
        if self.kind == "or_group" and not self.branches:
            raise ValueError("or_group needs branches")
        if self.kind == "monotonic" and not (
            self.params.get("order_by") and self.params.get("column")
        ):
            raise ValueError("monotonic needs order_by and column params")
        if self.kind == "fk_near_match" and not (
            self.params.get("max_edits") is not None
            or self.params.get("max_cer_ppm") is not None
        ):
            raise ValueError("fk_near_match needs max_edits and/or max_cer_ppm")

    def columns(self) -> set[str]:
        """Columns of the shape's own table this constraint touches (for
        query-driven constraint pruning — ReducedShapeParser.py:78-110 analog).
        ``unique`` is exempt: entity identity is always query-relevant."""
        cols = set()
        if self.kind != "unique" and "column" in self.params:
            cols.add(self.params["column"])
        if self.kind == "monotonic":
            cols.add(self.params["order_by"])
        cols |= set(self.params.get("columns", ()))  # stat_bound metric reads
        for b in self.branches:
            cols |= b.columns()
        return cols

    def shape_refs(self) -> set[str]:
        refs = set()
        if self.kind == "qualified_shape":
            refs.add(self.params["shape"])
        for b in self.branches:
            refs |= b.shape_refs()
        return refs

    def to_dict(self) -> dict:
        d = {"id": self.id, "kind": self.kind, "params": self.params}
        if self.branches:
            d["branches"] = [b.to_dict() for b in self.branches]
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "Constraint":
        return cls(
            id=d["id"],
            kind=d["kind"],
            params=d.get("params", {}),
            branches=[cls.from_dict(b) for b in d.get("branches", [])],
        )


@dataclass
class Shape:
    """target definition + conjunction of constraints (tc1 ShapeA..E analog)."""

    name: str
    table: str
    entity_col: str
    target_filter: str | None = None  # SQL boolean — sh:targetQuery analog
    constraints: list[Constraint] = field(default_factory=list)
    #: {column_name: SQL expr} computed ONCE scan-side (after the target
    #: filter / population restriction, before any constraint evaluates) —
    #: the derive-once-check-many device: several constraints referencing
    #: one expensive expression (e.g. a container-header parse) each
    #: re-expand it into codegen otherwise. Visible to row/expr, audio,
    #: unique, fdep and monotonic constraints of THIS shape; dataset-grain
    #: constraints (drift/stat_bound) read the raw table and do not see
    #: derived columns.
    derived_columns: dict[str, str] | None = None

    def shape_refs(self) -> set[str]:
        refs: set[str] = set()
        for c in self.constraints:
            refs |= c.shape_refs()
        return refs

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "table": self.table,
            "entity_col": self.entity_col,
            "target_filter": self.target_filter,
            "constraints": [c.to_dict() for c in self.constraints],
            "derived_columns": self.derived_columns,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Shape":
        return cls(
            name=d["name"],
            table=d["table"],
            entity_col=d["entity_col"],
            target_filter=d.get("target_filter"),
            constraints=[Constraint.from_dict(c) for c in d.get("constraints", [])],
            derived_columns=d.get("derived_columns"),
        )


@dataclass
class Suite:
    """A shape network — the whole schema document."""

    shapes: list[Shape]

    def shape(self, name: str) -> Shape:
        for s in self.shapes:
            if s.name == name:
                return s
        raise KeyError(name)

    def names(self) -> list[str]:
        return [s.name for s in self.shapes]

    def dependencies(self) -> dict[str, set[str]]:
        """shape -> set of shapes it references (edge direction: dependent -> prerequisite)."""
        return {s.name: s.shape_refs() for s in self.shapes}

    def to_json(self) -> str:
        return json.dumps({"shapes": [s.to_dict() for s in self.shapes]}, indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Suite":
        d = json.loads(text)
        return cls(shapes=[Shape.from_dict(s) for s in d["shapes"]])
