"""HTTP service facade — the reference's Flask app (``run.py``) rebuilt on
the Python stdlib (WSGI, zero extra dependencies) over this engine's
library API.

Route parity (ref run.py:21-66):

=========================  =================================================
reference                  here
=========================  =================================================
POST /multiprocessing      full suite evaluation (api.run) → JSON verdict
  (run.py:21-34)           rows (bounded by ``limit``) + per-shape counts
POST /validation           api.validation_summary → per-shape valid/invalid
  (run.py:37-48)           counts + bounded verdict rows
POST /reduce               api.explain (compile-only) → {"shapes": [...]};
  (run.py:51-62)           errors → {"result": [], "error": ...} exactly
                           like the reference's handler
GET  /                     health text (run.py:65-66)
=========================  =================================================

Form arguments (``application/x-www-form-urlencoded``, mirroring the
reference's config-driven form parsing, ref shaclapi/config.py):

* ``suite`` — the engine's native Suite JSON; OR
* ``schemaDir`` + ``shapeFormat`` (SHACL|JSON, ref config.py:128-139) +
  ``bindings`` — a JSON object {shape: {table, entity_col, columns?,
  links?, class_column?, target_filter?}} (links values are LinkBinding
  kwargs) — the relational analog of the reference's endpoint config;
* ``tables`` — JSON object {name: source ref} resolved through
  :func:`shaclapi_spark.sources.read_table` (``parquet:/path``,
  ``iceberg:cat.db.tbl``, catalog names, bare paths);
* ``targetShape`` — optional JSON list or comma-separated shape names
  (ref config.py:67-88 target_shape);
* ``limit`` — max verdict rows serialized into the response (default 1000;
  counts are always exact and computed distributed) — the HTTP layer must
  never ``collect()`` an unbounded relation onto the driver.

The server owns no SparkSession: :func:`make_app` closes over one the
caller built, so tests and deployments (e.g. behind ``spark-submit``)
control master/memory/conf. Concurrency note: wsgiref's simple server is
single-threaded, matching Spark's one-driver model; production would front
this with a real WSGI container, which is orthogonal to the engine.
"""

from __future__ import annotations

import json
import traceback
from typing import Callable
from urllib.parse import parse_qs

from pyspark.sql import DataFrame, SparkSession, functions as F

from shaclapi_spark import api, sources
from shaclapi_spark.shacl import LinkBinding, ShapeBinding, parse_shape_dir, to_suite
from shaclapi_spark.suite import Suite


def _json_default(v):
    # bytes (audio payloads) and other non-JSON scalars, defensively
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _rows(df: DataFrame, limit: int) -> list[dict]:
    """Bounded row serialization: LIMIT runs distributed; only ≤limit rows
    ever reach the driver."""
    return [r.asDict(recursive=True) for r in df.limit(limit).collect()]


def _parse_form(environ) -> dict[str, str]:
    try:
        length = int(environ.get("CONTENT_LENGTH") or 0)
    except ValueError:
        length = 0
    body = environ["wsgi.input"].read(length).decode("utf-8") if length else ""
    return {k: v[0] for k, v in parse_qs(body).items()}


def _load_suite(form: dict[str, str]) -> Suite:
    if "suite" in form:
        return Suite.from_json(form["suite"])
    if "schemaDir" in form:
        if "bindings" not in form:
            raise ValueError(
                "schemaDir requires a 'bindings' form field mapping each "
                "shape onto a table (the relational analog of the "
                "reference's endpoint)"
            )
        shapes = parse_shape_dir(
            form["schemaDir"], form.get("shapeFormat", "SHACL")
        )
        raw = json.loads(form["bindings"])
        bindings = {}
        for name, b in raw.items():
            links = {
                p: LinkBinding(**lb) for p, lb in (b.pop("links", {})).items()
            }
            bindings[name] = ShapeBinding(links=links, **b)
        return to_suite(shapes, bindings)
    raise ValueError("missing 'suite' (Suite JSON) or 'schemaDir' form field")


def _load_tables(
    spark: SparkSession, form: dict[str, str]
) -> dict[str, DataFrame]:
    if "tables" not in form:
        raise ValueError(
            "missing 'tables' form field: JSON {name: source ref}"
        )
    refs = json.loads(form["tables"])
    return {name: sources.read_table(spark, ref) for name, ref in refs.items()}


def _target_shapes(form: dict[str, str]) -> list[str] | None:
    raw = form.get("targetShape")
    if not raw:
        return None
    raw = raw.strip()
    if raw.startswith("["):
        return list(json.loads(raw))
    return [s.strip() for s in raw.split(",") if s.strip()]


def make_app(spark: SparkSession) -> Callable:
    """Build the WSGI application over an existing SparkSession."""

    def respond(start_response, status: str, payload, mimetype: str):
        body = (
            payload
            if isinstance(payload, bytes)
            else json.dumps(payload, default=_json_default).encode("utf-8")
            if not isinstance(payload, str)
            else payload.encode("utf-8")
        )
        start_response(
            status,
            [
                ("Content-Type", mimetype),
                ("Content-Length", str(len(body))),
            ],
        )
        return [body]

    def route_multiprocessing(form: dict[str, str]):
        suite = _load_suite(form)
        tables = _load_tables(spark, form)
        limit = int(form.get("limit", "1000"))
        res = api.run(spark, suite, tables, target_shapes=_target_shapes(form))
        counts = {
            r["shape"]: {"valid": int(r["valid"]), "invalid": int(r["invalid"])}
            for r in _rows(
                res.verdicts.groupBy("shape").agg(
                    F.sum(F.col("is_valid").cast("long")).alias("valid"),
                    F.sum((~F.col("is_valid")).cast("long")).alias("invalid"),
                ),
                10_000,
            )
        }
        return {
            "shapes": counts,
            "verdicts": _rows(res.verdicts, limit),
            "violations": _rows(res.violations, limit),
        }

    def route_validation(form: dict[str, str]):
        suite = _load_suite(form)
        tables = _load_tables(spark, form)
        limit = int(form.get("limit", "1000"))
        out = api.validation_summary(
            spark, suite, tables, target_shapes=_target_shapes(form)
        )
        return {
            "shapes": out["shapes"],
            "verdicts": _rows(out["verdicts"], limit),
        }

    def route_reduce(form: dict[str, str]):
        # the reference's /reduce never touches data — suite only
        suite = _load_suite(form)
        try:
            targets = _target_shapes(form)
            for name in targets or []:
                suite.shape(name)  # KeyError on unknown target, like the ref
            info = api.explain(suite, target_shapes=targets)
            return {"shapes": info["shapes"], "order": info["order"]}
        except Exception:  # noqa: BLE001 — parity: ref run.py:56-62
            return {"result": [], "error": repr(traceback.format_exc())}

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "/")
        method = environ.get("REQUEST_METHOD", "GET")
        if path == "/" and method == "GET":
            return respond(start_response, "200 OK", "shaclapi-spark", "text/plain")
        handlers = {
            "/multiprocessing": route_multiprocessing,
            "/validation": route_validation,
            "/reduce": route_reduce,
        }
        if path not in handlers:
            return respond(start_response, "404 Not Found", {"error": "no such route"}, "application/json")
        if method != "POST":
            return respond(start_response, "405 Method Not Allowed", {"error": "POST only"}, "application/json")
        form = _parse_form(environ)
        try:
            payload = handlers[path](form)
        except Exception as e:  # noqa: BLE001 — service boundary
            return respond(
                start_response,
                "400 Bad Request",
                {"error": f"{type(e).__name__}: {e}"},
                "application/json",
            )
        return respond(start_response, "200 OK", payload, "application/json")

    return app


def serve(spark: SparkSession, host: str = "127.0.0.1", port: int = 5000):
    """Blocking dev server (the analog of ``flask run`` on the reference).
    Returns the server (callers embed it; tests run it on port 0 in a
    thread)."""
    from wsgiref.simple_server import make_server

    srv = make_server(host, port, make_app(spark))
    return srv
