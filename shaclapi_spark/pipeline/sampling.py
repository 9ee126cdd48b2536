"""Deterministic sampling for training-data mixing.

Two primitives a 100-TB corpus pipeline needs constantly:

* ``hash_sample`` — Bernoulli-by-hash. Keep a row iff a stable hash of its
  id falls under the rate cutoff. It is a pure scan-side FILTER: no
  shuffle, no RNG state, pushes down to the parquet scan, and the same
  row is kept in every rerun / on every cluster size (unlike
  ``df.sample``, whose output depends on partitioning and seed plumbing).
  Per-stratum rates make it a data-mixing knob ("keep 100% of de, 10% of
  en").
* ``stratified_quota`` — exactly-n-per-stratum. Deterministic rank by
  (hash, id) inside each stratum. The naive form is one window over each
  full stratum — a skew bomb when one language is 90% of the corpus — so
  a ``prefilter_rate`` lets callers cheaply pre-thin dominant strata with
  the shuffle-free hash filter first and only window the survivors
  (two-phase: approximate cut scan-side, exact cut on the small remnant).

Both use the md5-derived 60-bit hash (first 15 hex chars) rather than
xxhash64 so the exact relation is reproducible in any engine with md5 —
the DuckDB oracle computes the identical sample.

Reference parity: the reference has no sampler; its closest notion is the
target-set restriction (shaclapi/reduction/Reduction.py:25-64) which picks
WHICH entities to validate — these operators pick which rows to keep, the
training-pipeline analog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# 60-bit hash space; cutoffs are computed in exact integer arithmetic so
# Spark and DuckDB agree bit-for-bit (no float rounding at the boundary).
_HASH_SPACE = 1 << 60


def md5_60(col: Column) -> Column:
    """Stable 60-bit integer hash: first 15 hex chars of md5. Identical to
    DuckDB's ('0x' || substring(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _cutoff(rate: float) -> int:
    return int(rate * _HASH_SPACE)


def hash_sample(
    df: DataFrame,
    id_col: str,
    rate: float | None = None,
    strata_col: str | None = None,
    strata_rates: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with
    md5_60(salt || id) < rate * 2^60.

    ``strata_rates`` maps stratum value → rate (rows in unlisted strata
    use ``rate``, or are dropped if ``rate`` is None). ``salt`` decorrelates
    independent samples of the same corpus (e.g. train/eval splits)."""
    h = md5_60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    if strata_rates is not None:
        if strata_col is None:
            raise ValueError("strata_rates requires strata_col")
        default = F.lit(_cutoff(rate)) if rate is not None else F.lit(-1)
        cut = default
        for value, r in strata_rates.items():
            cut = F.when(
                F.col(strata_col) == F.lit(value), F.lit(_cutoff(r))
            ).otherwise(cut)
        return df.filter(h < cut)
    if rate is None:
        raise ValueError("pass rate or strata_rates")
    return df.filter(h < F.lit(_cutoff(rate)))


def stratified_quota(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    quota: int,
    prefilter_rate: float | None = None,
    salt: str = "",
) -> DataFrame:
    """Exactly min(quota, |stratum|) rows per stratum, chosen by ascending
    (md5_60(salt || id), id) — a deterministic uniform draw.

    ``prefilter_rate``: optionally hash-filter to ~rate of each stratum
    BEFORE the window (shuffle-free). Because the window ranks by the SAME
    hash, a prefilter that keeps ≥ quota rows of a stratum yields the
    IDENTICAL final sample as no prefilter (the quota lowest hashes all
    survive any cutoff above them) — it only changes the result where it
    under-keeps, so size the rate with headroom (quota/|stratum| × ~2).
    """
    h = md5_60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    work = df.withColumn("__h", h)
    if prefilter_rate is not None:
        work = work.filter(F.col("__h") < F.lit(_cutoff(prefilter_rate)))
    w = Window.partitionBy(strata_col).orderBy("__h", id_col)
    return (
        work.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= quota)
        .drop("__h", "__rk")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    n_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Deterministic contiguous packing of docs into training sequences of
    ``capacity`` tokens — the "sequence packing" step an LLM data pipeline
    runs after filtering/dedup. Each doc gets (shard, seq_id, offset,
    n_tokens): docs are sharded by hash (load balance), ordered inside the
    shard by (hash, id) — a deterministic uniform shuffle — and assigned to
    the sequence where their FIRST token lands (running-sum / capacity).
    A doc straddling a boundary overflows its sequence by < its own length;
    the downstream writer truncates or pads — bin assignment itself stays
    a pure function of (corpus, capacity, n_shards, salt), identical on
    every rerun and cluster size.

    Scale shape: ONE hash-partition exchange (by shard) + per-shard sort —
    the window cumsum is the only pass; no global sort, no driver state.
    n_shards bounds per-task sort size: size it so a shard's docs fit an
    executor (100 TB / n_shards)."""
    h = md5_60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    work = df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % F.lit(n_shards)).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    return (
        work.withColumn("__cum", cum_before.cast("long"))
        .select(
            F.col(id_col),
            "shard",
            # integer DIV, not float division: a double quotient misrounds
            # near bin boundaries once cumsums reach 2^53
            F.expr(f"__cum DIV {int(capacity)}").alias("seq_in_shard"),
            (F.col("__cum") % F.lit(capacity)).cast("long").alias("offset"),
            F.col(token_col).cast("long").alias("n_tokens"),
        )
    )


def weighted_mix(
    df: DataFrame,
    id_col: str,
    weight: float | None = None,
    strata_col: str | None = None,
    strata_weights: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted replication — the UPsampling half of data
    mixing (hash_sample is the downsampling half; weights < 1 degenerate to
    it). A weight w = k + f replicates every row k times and adds one more
    copy iff md5_60(salt || id) < f·2^60, so a stratum with weight 2.5 sees
    every row twice and a deterministic hash-chosen half a third time —
    epoch semantics ("2.5 epochs of wikipedia") as a pure function of the
    corpus. Output adds a `copy` index (0-based) so downstream shuffles/
    packing can decorrelate replicas by hashing (id, copy).

    Fractional weights are quantized to millionths (ppm) before the cutoff
    is derived, so the cutoff integer is an exact function of round(f·10^6)
    — an independently written oracle that quantizes the same way computes
    the identical cutoff for ANY weight, not just dyadic fractions (w=2.1
    float-subtracts to 0.10000000000000009; without quantization its cutoff
    differs from int(0.1·2^60) by a few units and boundary rows flip).

    Scale shape: scan-side generator (explode of a sequence literal), no
    shuffle, no RNG state; rows with weight 0 are filtered at the scan."""
    if weight is None and strata_weights is None:
        raise ValueError("pass weight or strata_weights")
    if strata_weights is not None and strata_col is None:
        raise ValueError("strata_weights requires strata_col")
    h = md5_60(F.concat(F.lit(salt), F.col(id_col).cast("string")))

    def n_copies(w: float):
        k = int(w)
        frac_ppm = round((w - k) * 1_000_000)
        cutoff = frac_ppm * _HASH_SPACE // 1_000_000  # exact int arithmetic
        extra = (
            F.when(h < F.lit(cutoff), F.lit(1)).otherwise(F.lit(0))
            if frac_ppm > 0
            else F.lit(0)
        )
        return F.lit(k) + extra

    if strata_weights is not None:
        copies = n_copies(weight) if weight is not None else F.lit(0)
        for value, w in strata_weights.items():
            copies = F.when(
                F.col(strata_col) == F.lit(value), n_copies(w)
            ).otherwise(copies)
    else:
        copies = n_copies(weight)
    return (
        df.withColumn("__n", copies)
        .filter(F.col("__n") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def bucket_prefix_offsets(
    keyed: DataFrame, bucket_col: str, weight_col: str | None = None
) -> tuple[dict, int]:
    """The shared half of the two-phase global-rank/cumsum device
    (epoch_shuffle / budget_cut / layout.zorder_file_assignment): ONE
    narrow aggregate over the range-bucket column — row counts, or sums
    of ``weight_col`` — collected (bounded: <= n_buckets rows) and
    prefix-summed in bucket order on the driver. Returns
    ``(offsets, total)`` where offsets[b] = combined weight of all
    buckets ordered before b. Callers broadcast the offsets back via
    ``offsets_map`` and add them to per-bucket window ranks/cumsums."""
    agg = (
        F.sum(F.col(weight_col).cast("long"))
        if weight_col is not None
        else F.count("*")
    )
    rows = keyed.groupBy(bucket_col).agg(agg.alias("__s")).collect()
    sums = {r[bucket_col]: int(r["__s"] or 0) for r in rows}
    offsets, acc = {}, 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b]
    return offsets, acc


def offsets_map(offsets: dict, key_type: str = "bigint") -> Column:
    """Broadcastable literal map column from a bucket→offset dict. An
    EMPTY dict still yields a typed map (an argless create_map is
    VOID-typed and fails analysis on the first lookup — the empty-corpus
    path must plan like any other)."""
    if not offsets:
        return F.create_map().cast(f"map<{key_type},bigint>")
    return F.create_map(*[F.lit(x) for bo in offsets.items() for x in bo])


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int = 0,
    n_buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """Deterministic global training shuffle: adds ``shuffle_rank`` — the
    1-based position of each row in the order a trainer should consume it
    for this ``epoch``. Exactly ``row_number() OVER (ORDER BY key, id)``
    where key = md5_60(epoch-salted id), but computed WITHOUT a global
    single-partition window (the usual scale bomb).

    Two-phase rank:

    1. RANGE-bucket the key by its high bits (key is uniform in [0, 2^60),
       so ``key >> (60 - log2(n_buckets))`` gives ordered, balanced
       buckets — bucket order IS key order, unlike hash-mod buckets).
       One narrow aggregate counts rows per bucket; the ≤ n_buckets count
       rows are collected and prefix-summed on the driver (bounded,
       documented collect — the same pattern as IVF's bounded training
       sample).
    2. One window per bucket (parallel across buckets) ranks within the
       bucket by (key, id); the broadcast prefix offsets lift bucket-local
       ranks to global ranks.

    Ties on the 60-bit key are broken by the id, so the order is total
    and engine-independent; a different ``epoch`` (or ``salt``) draws an
    independent permutation of the same corpus.
    """
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError("n_buckets must be a power of two")
    shift = 60 - n_buckets.bit_length() + 1  # log2(n_buckets) high bits
    key = md5_60(
        F.concat(
            F.lit(f"epoch{epoch}:{salt}:"), F.col(id_col).cast("string")
        )
    )
    keyed = df.withColumn("__key", key).withColumn(
        "__b", F.shiftright(F.col("__key"), shift)
    )
    offsets, _total = bucket_prefix_offsets(keyed, "__b")
    offset_map = offsets_map(offsets)
    w = Window.partitionBy("__b").orderBy("__key", F.col(id_col))
    return (
        keyed.withColumn(
            "shuffle_rank",
            (
                F.row_number().over(w)
                + offset_map[F.col("__b")].cast("long")
            ).cast("long"),
        )
        .drop("__key", "__b")
    )


def top_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group by ``order_cols`` (a list of Columns or column
    names; pass ``F.col(c).desc()`` for descending). Append a tiebreak
    column (e.g. the id) to make the selection deterministic.

    The classic per-group selection (best-quality doc per source, loudest
    clip per codec, ...) — the grouped counterpart of the global
    TakeOrderedAndProject top-k (SURVEY.md §2.6).

    Scale shape: one hash exchange on the group key; Spark's
    WindowGroupLimit pushes the ``rank <= k`` filter INTO the sort, so
    each task keeps a k-row heap per group instead of fully sorting every
    group — skew from a dominant group costs a k-bounded scan, not a
    full-group sort spill (plan-asserted in tests/test_plans.py)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
        .withColumn(rank_col, F.col(rank_col).cast("int"))
    )


def packed_batch_stats(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    capacity: int,
    n_shards: int = 64,
    salt: str = "",
    sum_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-BATCH rollup of the ``pack_sequences`` assignment — the relation
    a dataloader actually consumes: one row per (shard, seq_in_shard) with
    the item count, the packed weight, and optional extra sums (e.g. pack
    audio clips by ``dur_ms`` and carry the transcript token total, so a
    batch is bounded in playback seconds AND observable in text tokens).

    The assignment is identical to ``pack_sequences`` (hash shard,
    deterministic in-shard order by (hash, id), running-sum DIV capacity)
    and therefore a pure function of (input, capacity, n_shards, salt).
    Duplicate ids assign as a deterministic multiset: equal rows share a
    hash and adjacent cum slots, so the batch-level sums are reproducible
    even when the in-window order between equal rows is not.

    Scale shape: the same single hash exchange + per-shard window cumsum
    as ``pack_sequences``, then one batch-grain aggregation — partial
    aggregation collapses each shard's rows map-side, so the second
    exchange moves one row per BATCH, not per item."""
    h = md5_60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    work = df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % F.lit(n_shards)).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(weight_col)).over(w), F.lit(0))
    assigned = work.withColumn("__cum", cum_before.cast("long"))
    return (
        assigned.groupBy(
            "shard", F.expr(f"__cum DIV {int(capacity)}").alias("seq_in_shard")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(weight_col).cast("long").alias("total_weight"),
            *[F.sum(c).cast("long").alias(f"sum_{c}") for c in sum_cols],
        )
    )


def length_bucket_padding(
    df: DataFrame,
    len_col: str,
    bucket_bounds: list[int],
    id_col: str | None = None,
) -> DataFrame:
    """Padding-efficiency report for length-bucketed batching — the ASR/LLM
    training question "how much compute do we burn on pad frames if we
    bucket by duration with THESE boundaries?". Rows are assigned to the
    first bucket whose upper bound >= len; rows longer than the last bound
    go to an overflow bucket padded to the observed max. Output per bucket:
    ``bucket_idx``, ``bucket_max`` (the padded-to length: the bound, or the
    observed max for the overflow bucket), ``n_rows``, ``sum_len``,
    ``padded_total`` (n_rows * bucket_max), ``pad_waste``
    (padded_total - sum_len) — all exact integers, so the relation
    value-hashes across engines. The global padding overhead is
    sum(pad_waste) / sum(sum_len).

    Scale shape (100 TB): bucket assignment is a scan-side CASE over the
    sorted bounds (whole-stage codegen, no UDF); the report is ONE
    map-combinable groupBy over at most len(bounds)+1 keys — the shuffle
    carries a handful of partial-aggregate rows per task. NULL / negative
    lengths are excluded (they are validation failures, not batchable
    rows)."""
    bounds = sorted(set(int(b) for b in bucket_bounds))
    if not bounds or bounds[0] <= 0:
        raise ValueError(f"bucket_bounds must be positive, got {bucket_bounds}")
    ln = F.col(len_col).cast("long")
    idx: Column = F.lit(len(bounds))  # overflow bucket
    bmax: Column = F.lit(None).cast("long")
    for i in range(len(bounds) - 1, -1, -1):
        idx = F.when(ln <= bounds[i], F.lit(i)).otherwise(idx)
        bmax = F.when(ln <= bounds[i], F.lit(bounds[i])).otherwise(bmax)
    out = (
        df.filter(ln.isNotNull() & (ln >= 0))
        .select(idx.alias("bucket_idx"), bmax.alias("__bmax"), ln.alias("__len"))
        .groupBy("bucket_idx")
        .agg(
            # bound buckets have a constant __bmax; the overflow bucket pads
            # to its own observed max
            F.coalesce(F.max("__bmax"), F.max("__len")).alias("bucket_max"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("__len").cast("long").alias("sum_len"),
        )
        .withColumn(
            "padded_total", (F.col("n_rows") * F.col("bucket_max")).cast("long")
        )
        .withColumn(
            "pad_waste", (F.col("padded_total") - F.col("sum_len")).cast("long")
        )
    )
    return out.select(
        "bucket_idx", "bucket_max", "n_rows", "sum_len", "padded_total", "pad_waste"
    )


def interleave_sources(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict | None = None,
    salt: str = "",
    n_buckets: int = 64,
) -> DataFrame:
    """Proportional source interleaving: adds ``interleave_key`` (long)
    such that consuming rows in ascending (interleave_key, source, id)
    order visits sources in proportion to their integer ``weights`` —
    the mixture SCHEDULE (ordering) that complements weighted_mix's
    mixture COMPOSITION (upsampling). A weight-3 source contributes 3
    rows for every 1 of a weight-1 source, evenly spread, not batched.

    The key is exact integer math: the row with within-source rank r
    (1-based, ordered by md5_60(salt-keyed id) — a deterministic draw)
    gets ``r * (L // w_source)`` where L = lcm(weights); merging sorted
    streams by this key is the classic rational-rate interleave.

    Scale shape: within-source rank uses the same two-phase range-bucket
    rank as epoch_shuffle (buckets of the 60-bit key high bits; one
    bounded collect of n_sources × n_buckets counts; per-(source, bucket)
    windows + broadcast prefix offsets) — no single-partition window even
    when one source dominates the corpus.

    ``weights`` maps source value -> positive int; unlisted sources weigh
    1. The output keeps all input columns.
    """
    import math as _math

    weights = dict(weights or {})
    if any((not isinstance(w, int)) or w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError("n_buckets must be a power of two")
    lcm = 1
    for w in list(weights.values()) + [1]:
        lcm = lcm * w // _math.gcd(lcm, w)
    shift = 60 - n_buckets.bit_length() + 1
    key = md5_60(
        F.concat(F.lit(f"interleave:{salt}:"), F.col(id_col).cast("string"))
    )
    keyed = df.withColumn("__key", key).withColumn(
        "__b", F.shiftright(F.col("__key"), shift)
    )
    counts = (
        keyed.groupBy(source_col, "__b").agg(F.count("*").alias("n")).collect()
    )
    per_source: dict = {}
    for r in counts:
        per_source.setdefault(r[source_col], {})[r["__b"]] = r["n"]
    offset_entries = []
    for src, bcounts in per_source.items():
        acc = 0
        for b in sorted(bcounts):
            offset_entries.append((f"{src}\x00{b}", acc))
            acc += bcounts[b]
    offset_map = (
        F.create_map(*[F.lit(x) for kv in offset_entries for x in kv])
        if offset_entries
        else F.create_map().cast("map<string,bigint>")
    )
    # per-source step: L // w  (w divides L by construction)
    step = F.lit(lcm)
    for src, w in weights.items():
        step = F.when(F.col(source_col) == src, F.lit(lcm // w)).otherwise(step)
    w_rank = Window.partitionBy(source_col, "__b").orderBy(
        "__key", F.col(id_col)
    )
    rank = (
        F.row_number().over(w_rank)
        + offset_map[
            F.concat(F.col(source_col), F.lit("\x00"), F.col("__b"))
        ].cast("long")
    ).cast("long")
    return (
        keyed.withColumn("interleave_key", rank * step)
        .drop("__key", "__b")
    )


def budget_cut(
    df: DataFrame,
    id_col: str,
    token_col: str,
    priority_col: str,
    budget: int,
    boundaries: list | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Priority-ordered token-budget cut: keep the best documents until the
    cumulative token count would exceed ``budget`` — the "take the
    highest-quality 15T tokens" step that ends an LLM curation pipeline.
    Kept set = the largest prefix of the corpus ordered by
    (priority DESC, id ASC) whose token sum is <= budget; the boundary doc
    that would overflow is dropped (no partial documents). Output keeps all
    input columns plus ``cum_tokens`` (the inclusive running total), so the
    result doubles as the priority-ordered manifest.

    Scale shape: the global prefix-sum is NOT a single-partition window.
    Same two-phase device as ``epoch_shuffle``: rows are range-bucketed by
    priority VALUE (bucket = number of boundaries above it, so every tie
    lands in one bucket and bucket order is priority order), one narrow
    aggregate computes per-bucket token sums (<= n_buckets+1 rows,
    collected), prefix offsets broadcast back, and each bucket runs its own
    window cumsum in parallel. Buckets whose offset already exceeds the
    budget are filtered BEFORE the window — at 100 TB the sort only ever
    touches the budget-straddling bucket and its predecessors.

    ``boundaries``: explicit descending-priority bucket edges. Omitted, they
    are estimated from ``approxQuantile`` over the priority column (one
    extra scan, documented; pass explicit edges in production to skip it).

    Reference parity: no analog — the reference validates, it does not
    select training data (SURVEY.md §2.7 disposition); this extends the
    training-pipeline layer like weighted_mix/pack_sequences.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    p = F.col(priority_col).cast("double")
    # rows with NULL priority are excluded, not ranked: every boundary
    # comparison on NULL would otherwise fall through to bucket 0 and let
    # unscored docs consume budget ahead of every scored one
    df = df.filter(p.isNotNull())
    if boundaries is None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        boundaries = sorted(
            set(df.stat.approxQuantile(priority_col, qs, 0.01)), reverse=True
        )
    else:
        boundaries = sorted({float(b) for b in boundaries}, reverse=True)
    # bucket 0 holds priorities > boundaries[0], bucket i those in
    # (boundaries[i], boundaries[i-1]]; ties share a bucket by construction
    idx: Column = F.lit(0)
    for i, b in enumerate(boundaries):
        idx = idx + F.when(p <= F.lit(float(b)), F.lit(1)).otherwise(F.lit(0))
    keyed = df.withColumn("__b", idx)
    offsets, _total = bucket_prefix_offsets(keyed, "__b", weight_col=token_col)
    # buckets that start past the budget can never contribute a kept row
    live = [b for b, off in offsets.items() if off <= budget]
    if not live:
        return keyed.filter(F.lit(False)).drop("__b").withColumn(
            "cum_tokens", F.lit(0).cast("long")
        )
    offset_map = offsets_map({b: offsets[b] for b in live})
    w = (
        Window.partitionBy("__b")
        .orderBy(p.desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        keyed.filter(F.col("__b").isin(live))
        .withColumn(
            "cum_tokens",
            (
                F.sum(F.col(token_col).cast("long")).over(w)
                + offset_map[F.col("__b")].cast("long")
            ).cast("long"),
        )
        .filter(F.col("cum_tokens") <= F.lit(int(budget)))
        .drop("__b")
    )
