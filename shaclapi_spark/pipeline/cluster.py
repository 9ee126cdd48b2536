"""Connected components over near-dup pair relations → dedup clusters.

The step between pair generation (``jaccard_pairs`` / ``minhash_lsh_neardups``
/ ``simhash_neardups`` / ``embedding_neardups``) and actual deduplication:
group the pair graph into components and keep one survivor per component.
(The reference engine has no dedup layer — this extends the training-data
pipeline; its closest analog is the shape-dependency graph traversal,
shaclapi/reduction/Reduction.py:14-23, which walks the network on the
driver because shape counts are tiny. Duplicate graphs over web corpora
have billions of nodes, so the walk must itself be a dataflow.)

Scale notes (the part that matters at 100 TB):

* The pair graph is SPARSE relative to the corpus (near-dup blocking emits
  pairs only for colliding docs — 64 edges from 220k docs on the bench
  fixture), so the edge relation is persisted and sized once, and small
  graphs (≤ ``driver_edge_limit`` edges, default 500k, AND
  ``driver_byte_limit`` id-payload bytes, default 64 MB — which for
  16-char string ids means ~100-200 MB of transient driver memory
  including the Arrow batches and the python union-find dict) take a
  driver-side union-find fast path: one bounded Arrow collect,
  microseconds of find/union, one Arrow createDataFrame back — the same
  bounded-driver device as IVF's training sample and epoch_shuffle's
  offset collect. Measured ~7 s of fixed per-round dataflow overhead
  saved on a 64-edge graph.
* Above the limit, driver-side union-find would need the whole edge list
  on one machine — a non-starter. There it is distributed min-label
  propagation: per round, each node takes the min of its own label and its
  neighbors' labels — ONE shuffle (groupBy node) per round, edge relation
  reused unchanged from the persisted cache.
* Rounds needed = graph diameter. Near-dup graphs are star-shaped
  (a template/boilerplate hub plus leaves; diameter ~2-4), so label
  propagation finishes in a handful of rounds; the O(log^2 n)
  large-star/small-star alternation (Kiveris et al., SoCC'14) only wins
  on long-chain graphs that dedup workloads don't produce.
* Each round ends in `localCheckpoint(eager=True)` — without it the
  lineage doubles per round and the planner chokes by round ~8 (same
  device as the engine's cyclic fixpoint, engine.py).
* Convergence costs ZERO extra jobs: the label update carries an
  `Observation` counting changed labels, collected as a side effect of
  the eager checkpoint job itself — no separate diff/probe action.
* Labels are node ids (min id wins): deterministic output, join-able back
  to the corpus with no second pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, Window, functions as F

from shaclapi_spark.pipeline.sampling import _HASH_SPACE, md5_60


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Bounded driver-side components: collect the (already persisted,
    already gated-by-bytes) edge relation via Arrow, run path-compressed
    union-find with min-id representatives, ship the label table back via
    an Arrow-encoded pandas frame. Output is IDENTICAL to the distributed
    path (min id per component)."""
    import pandas as pd

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # Arrow batch transfer (toPandas), not row-at-a-time Row objects —
    # ~5-10x less driver memory than collect() of Row for string ids
    pdf = edges.toPandas()
    for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # min-id root wins, matching the distributed min-label result
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    out = pd.DataFrame(
        {"node": list(parent), "component": [find(n) for n in parent]}
    )
    id_type = edges.schema["u"].dataType
    from pyspark.sql.types import StructField, StructType

    return edges.sparkSession.createDataFrame(
        out,
        StructType(
            [
                StructField("node", id_type, True),
                StructField("component", id_type, True),
            ]
        ),
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
    driver_edge_limit: int = 500_000,
    driver_byte_limit: int = 64 << 20,
) -> DataFrame:
    """(node, component): min-id label per connected component of the
    undirected pair graph. Graphs within BOTH ``driver_edge_limit``
    distinct edges AND ``driver_byte_limit`` estimated id-payload bytes
    use the bounded driver union-find fast path (see module docstring);
    larger graphs run distributed min-label propagation. Both paths
    produce the identical relation.

    The byte gate is the real bound: 500k edges of 16-char string ids is
    ~16 MB of id payload → roughly 100-200 MB of transient driver memory
    (Arrow batches + the python dict); long ids or higher limits scale
    that linearly, which is why the gate measures sum(len(u)+len(v))
    rather than trusting the edge count alone."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    # materialize the cache and learn the graph size in one job; edge
    # count AND estimated id bytes gate the driver fast path
    from pyspark.sql.types import StringType

    if isinstance(edges.schema["u"].dataType, StringType):
        sz = F.sum(F.length("u") + F.length("v"))
    else:
        sz = F.count(F.lit(1)) * F.lit(16)
    stats = edges.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(sz, F.lit(0)).alias("bytes")
    ).collect()[0]
    n_edges, id_bytes = stats["n"], stats["bytes"]
    if n_edges <= driver_edge_limit and id_bytes <= driver_byte_limit:
        out = _driver_union_find(edges)
        edges.unpersist()
        return out
    # symmetric neighbor relation: one cached edge scan feeds every round
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for i in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("v"), F.col("component").alias("__nl")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("__nl").alias("__nm"))
        )
        obs = Observation(f"cc_round_{i}")
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("__nm", F.col("component"))
                ).alias("new_component"),
                F.col("component").alias("old_component"),
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum(
                        (F.col("new_component") != F.col("old_component")).cast(
                            "long"
                        )
                    ),
                    F.lit(0).cast("long"),
                ).alias("n_changed"),
            )
            .select("node", F.col("new_component").alias("component"))
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        if obs.get["n_changed"] == 0:
            break
    edges.unpersist()
    return labels


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    driver_edge_limit: int = 500_000,
) -> DataFrame:
    """(doc, cluster_rep, cluster_size): one row per document that appears
    in any near-dup pair; cluster_rep is the minimum doc id of its
    connected component (the survivor), cluster_size the component size.
    Pair-free docs are their own singleton cluster and are omitted —
    callers keep them as-is (anti-join on this relation = the dedup)."""
    comp = connected_components(
        pairs, a_col, b_col, driver_edge_limit=driver_edge_limit
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc"),
            F.col("component").alias("cluster_rep"),
            "cluster_size",
        )
    )


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """The deduplicated corpus: drop every doc in a near-dup cluster except
    its minimum-id representative. Anti-join keeps the (dominant) pair-free
    population without shuffling it against the cluster relation."""
    losers = dedup_clusters(pairs, a_col, b_col).filter(
        F.col("doc") != F.col("cluster_rep")
    )
    return df.join(
        losers.select(F.col("doc").alias(id_col)), id_col, "left_anti"
    )


def survivors_by_precedence(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    priority: Column,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Source-precedence dedup: keep, per near-dup cluster, the member
    with the LOWEST ``priority`` value (ties broken by id) instead of the
    minimum id — the policy real curation uses when the same content
    appears in a curated source and a crawl (keep curated, drop crawl).
    ``priority`` is any integer/orderable expression over ``df``'s
    columns (e.g. a CASE over the source column); cross-source
    duplication stats (corpus.source_overlap) are the diagnostic input
    for choosing it.

    Scale shape: the ranking window partitions by cluster_rep over the
    CLUSTER MEMBERS ONLY (pair-touched docs — a small fraction of the
    corpus); the dominant pair-free population flows through a single
    left_anti join against the loser set, exactly like dedup_survivors.
    """
    clusters = dedup_clusters(pairs, a_col, b_col)
    members = clusters.join(
        df.select(F.col(id_col).alias("doc"), priority.alias("__prio")),
        "doc",
    )
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col("__prio").asc(), F.col("doc").asc()
    )
    losers = (
        members.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") > 1)
        .select(F.col("doc").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


def leakage_free_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    a_col: str = "a",
    b_col: str = "b",
    salt: str = "",
) -> DataFrame:
    """Train/validation/test assignment that cannot leak near-duplicates
    across splits: every document in a near-dup connected component is
    assigned by a hash of the COMPONENT representative, not its own id, so
    a training doc's near-copy can never land in the eval split (the
    standard failure mode of per-row random splits over web corpora).
    Pair-free docs hash their own id — same code path, component of one.

    ``fractions`` maps split name -> fraction; fractions are quantized to
    exact ppm and laid out as consecutive cutoff intervals of the 60-bit
    md5 space in sorted-split-name order, so the assignment is a pure
    integer function of (corpus, pairs, fractions, salt) — identical on
    any engine with md5 (the DuckDB oracle replays it). Fractions must sum
    to 1 (after ppm quantization a remainder <= len(fractions) ppm is
    folded into the last split).

    Output: all input columns + ``split`` (string).

    Scale shape: the component relation covers only pair-touched docs (a
    small fraction of the corpus); the dominant pair-free population takes
    a broadcast-able left join + a scan-side hash filter — no extra
    shuffle of the corpus. Label propagation itself is the bounded-round
    dataflow of ``connected_components`` above.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    ppm = {
        name: round(float(f) * 1_000_000) for name, f in fractions.items()
    }
    total = sum(ppm.values())
    if abs(total - 1_000_000) > len(ppm):
        raise ValueError(f"fractions must sum to 1, got {total/1e6}")
    names = sorted(ppm)
    ppm[names[-1]] += 1_000_000 - total  # fold rounding remainder
    comp = connected_components(pairs, a_col, b_col)
    group_key = F.coalesce(
        F.col("__component").cast("string"), F.col(id_col).cast("string")
    )
    h = md5_60(F.concat(F.lit(f"split:{salt}:"), group_key))
    acc = 0
    split: Column = F.lit(names[-1])
    for name in names[:-1]:
        lo = acc * _HASH_SPACE // 1_000_000
        acc += ppm[name]
        hi = acc * _HASH_SPACE // 1_000_000
        split = F.when((h >= F.lit(lo)) & (h < F.lit(hi)), F.lit(name)).otherwise(
            split
        )
    return (
        df.join(
            comp.select(
                F.col("node").alias(id_col),
                F.col("component").alias("__component"),
            ),
            id_col,
            "left",
        )
        .withColumn("split", split)
        .drop("__component")
    )
