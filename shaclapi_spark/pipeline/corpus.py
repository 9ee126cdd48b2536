"""Corpus-level n-gram statistics — boilerplate detection and frequent-span
reporting, the analysis pass a training-data pipeline runs to find templated
/ repeated content before filtering it.

Reference parity: the reference validates a fixed shape suite
(shaclapi/api.py:22-60); corpus statistics are an engine-original addition
mandated by the graft brief (training-data pipeline ops), same category as
dedup/decontamination in `pipeline/dedup.py`.

Scale shape (100 TB):

* ``top_ngrams`` is the canonical word-count plan: explode → two
  map-combinable hash aggregations → ``TakeOrderedAndProject``. Shuffle 1
  moves one row per (doc, distinct-gram-in-doc) — partial aggregation has
  already collapsed a doc's repeats map-side, because a doc's grams are
  born co-located in its input row. Shuffle 2 moves one row per
  partition-distinct gram. Nothing is ever collected except the final k
  rows.
* ``boilerplate_score`` keys every wide join on the 16-byte gram digest,
  never the gram text; the boilerplate set (grams above the doc-frequency
  floor) is tiny by construction — high-frequency heads of a Zipf
  distribution — and is broadcast, so the per-doc scoring pass is a scan +
  generator + broadcast join + one re-group by doc id.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from shaclapi_spark.pipeline.dedup import word_ngram_hashes
from shaclapi_spark.pipeline.text import word_ngrams


def top_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    k: int = 25,
) -> DataFrame:
    """Top-k corpus word n-grams: (ngram, n_docs, n_occurrences).

    Deterministic total order — (n_occurrences DESC, n_docs DESC, ngram
    ASC) — so the boundary of the top-k is tie-stable across engines.
    """
    grams = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"),
    )
    per_doc = grams.groupBy("ngram", "__id").agg(F.count("*").alias("__cnt"))
    stats = per_doc.groupBy("ngram").agg(
        F.sum("__cnt").alias("n_occurrences"),
        F.count("*").alias("n_docs"),
    )
    return stats.orderBy(
        F.desc("n_occurrences"), F.desc("n_docs"), F.asc("ngram")
    ).limit(k)


def boilerplate_grams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_df: int = 100,
) -> DataFrame:
    """Digests of grams whose corpus DOC frequency is ≥ ``min_df``:
    (__g, df). Doc frequency (not occurrence count) is the boilerplate
    signal — a gram repeated many times inside ONE doc is repetition
    (`pipeline/text.py` repetition_columns), not boilerplate.

    Per-doc distinctness is free: ``array_distinct`` runs inside the doc's
    own row before the explode, so the aggregate is a single
    map-combinable count over 16-byte digests — no (doc, gram) dedup
    shuffle.
    """
    return (
        docs.select(
            F.explode(
                F.array_distinct(word_ngram_hashes(F.col(text_col), n))
            ).alias("__g")
        )
        .groupBy("__g")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= F.lit(min_df))
    )


def boilerplate_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_df: int = 100,
) -> DataFrame:
    """Per-doc boilerplate exposure: (id, n_grams, n_boiler,
    boilerplate_frac) where a gram is boilerplate when its corpus doc
    frequency ≥ ``min_df``. ``n_grams``/``n_boiler`` count the doc's
    DISTINCT grams; docs with fewer than n words score 0 over 0 grams
    (frac NULL).

    Plan: boilerplate digest set (small — Zipf head) broadcast; corpus side
    is one scan → explode(array_distinct) → broadcast left join → re-group
    by doc id. The re-group is map-combinable and a doc's grams are born
    co-located, so one narrow row per doc crosses the wire.
    """
    boiler = F.broadcast(
        boilerplate_grams(docs, id_col, text_col, n, min_df)
        .select("__g")
        .withColumn("__hit", F.lit(True))
    )
    grams = docs.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(word_ngram_hashes(F.col(text_col), n))
        ).alias("__g"),
    )
    return (
        grams.join(boiler, "__g", "left")
        .groupBy(id_col)
        .agg(
            F.count("__g").alias("n_grams"),
            F.coalesce(
                F.sum(F.col("__hit").cast("long")), F.lit(0).cast("long")
            ).alias("n_boiler"),
        )
        .withColumn(
            "boilerplate_frac",
            F.when(
                F.col("n_grams") > 0,
                F.col("n_boiler") / F.col("n_grams"),
            ),
        )
    )


def distinctive_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_tf: int = 1,
) -> DataFrame:
    """Per-doc top-k distinctive terms: TF-IDF-style ranking with the
    score kept EXACTLY reproducible cross-engine — ``score = tf * (N /
    df)`` (term frequency x inverse document frequency as an exact
    rational evaluated in IEEE double; ``ln`` variants are NOT
    correctly-rounded across libms, so the classic ``tf*ln(N/df)`` cannot
    value-hash match another engine — same monotone ranking per doc
    either way, since ln is increasing in N/df).

    Output: (id, term, tf, df, score, rank), rank 1..k per doc by
    (score DESC, term ASC) — tie-stable.

    Scale shape: tf comes from a map-combinable groupBy whose (doc, term)
    keys are born co-located in the doc's row; df reuses THAT relation
    grouped by term (counting rows = docs, since (doc, term) is distinct
    by construction); corpus size N is a 1-row aggregate joined by
    broadcast; the tf-df join shuffles on the term digest-sized key; the
    final per-doc top-k is a WindowGroupLimit (k-row heap per task, see
    sampling.top_per_group)."""
    from shaclapi_spark.pipeline.sampling import top_per_group
    from shaclapi_spark.pipeline.text import normalize_text

    words = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda x: x != ""
    )
    tf = (
        docs.select(F.col(id_col), F.explode(words).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .where(F.col("tf") >= F.lit(min_tf))
    )
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(
        F.count("*").cast("double").alias("__n")
    )
    scored = (
        tf.join(df_rel, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("__n") / F.col("df").cast("double")),
        )
        .drop("__n")
    )
    return top_per_group(
        scored.select(id_col, "term", "tf", "df", "score"),
        id_col,
        [F.col("score").desc(), F.col("term").asc()],
        k=k,
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """First step of byte-pair-encoding tokenizer training: adjacent
    character-pair frequencies over the corpus WORD-FREQUENCY dictionary
    (classic BPE trains merges on the word-count dict, not the raw
    stream). Output per pair: ``n_occurrences`` (occurrences weighted by
    word frequency — what the BPE merge rule ranks) and
    ``n_distinct_words`` (vocabulary support). With ``top_k``, returns
    the merge candidates in rank order (count desc, pair asc — a total
    order, so the cut is deterministic).

    Scale shape (100 TB): the corpus-sized stage is the word count —
    explode + one map-combinable hash aggregation whose shuffle moves
    (word, partial count), already collapsed per input partition. The
    pair explode then runs on the VOCABULARY relation (Zipf-small,
    millions of rows at any corpus size, not corpus-sized), and the
    final pair aggregation is alphabet^2-bounded. Nothing is collected.
    All built-ins — substr/sequence/explode stay whole-stage-codegen
    except the interpreted-but-vocab-sized transform."""
    from shaclapi_spark.pipeline.text import normalize_text

    words = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda x: x != "")
    wf = (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
        .filter(F.length("word") >= 2)
    )
    pairs = wf.select(
        "word",
        "n_word",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("n_word").cast("long").alias("n_occurrences"),
        F.count_distinct(F.col("word")).cast("long").alias("n_distinct_words"),
    )
    if top_k is not None:
        agg = agg.orderBy(F.col("n_occurrences").desc(), F.col("pair").asc()).limit(
            int(top_k)
        )
    return agg


def vocab_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus' own top-V
    vocabulary — the curation signal that separates natural-language docs
    from code dumps / garbage / wrong-language residue (their tokens
    miss the head of the corpus distribution). Output per doc:
    ``n_tokens``, ``n_oov`` (tokens outside the top-``vocab_size`` words
    by corpus frequency; rank ties broken by word ASC so the vocabulary
    cut is a total order).

    Scale shape (100 TB): pass 1 is the canonical word count (explode +
    map-combinable aggregation, vocabulary-sized output) with the top-V
    cut as TakeOrderedAndProject (per-partition partial top-V, never a
    single-task global sort); the V-row vocabulary then BROADCASTS into
    pass 2's left join, so the per-doc scoring is scan + generator +
    broadcast hash join + one re-group by doc id — the corpus never
    shuffles by word."""
    from pyspark.sql.functions import broadcast

    from shaclapi_spark.pipeline.text import normalize_text

    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    words = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda x: x != "")
    toks = docs.select(F.col(id_col), F.explode(words).alias("word"))
    wf = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n_word"))
    vocab = (
        wf.orderBy(F.col("n_word").desc(), F.col("word").asc())
        .limit(int(vocab_size))
        .select("word")
        .withColumn("__in_vocab", F.lit(True))
    )
    scored = toks.join(broadcast(vocab), "word", "left")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )


def bigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document quantized bigram cross-entropy against the corpus' own
    bigram model — the CCNet-style perplexity filter (low surprisal =
    templated/common text, high = rare/garbled), kept EXACTLY reproducible
    cross-engine by quantizing each bigram's surprisal to the integer
    ``floor(log2(ctx/cnt))`` where ``cnt`` is the corpus count of the
    bigram and ``ctx`` the corpus count of its left-word context.

    Exactness: for integers a ≥ b ≥ 1, ``floor(log2(a/b)) ==
    length(bin(a DIV b)) - 1`` — with q = a DIV b and k = bitlen(q)-1,
    2^k ≤ q ≤ a/b and a/b < q+1 ≤ 2^(k+1), so the float-free bit-length
    form is the exact value (no libm log in either engine). The per-doc
    mean is a single IEEE division of two int64s — correctly rounded and
    identical cross-engine.

    Output per doc (docs with < 2 words keep a row with zeros/NULL mean):
    ``n_bigrams`` (token instances), ``surprisal_sum`` (Σ count·floor-log2),
    ``mean_surprisal`` (sum/instances as double, NULL when n_bigrams = 0).

    Scale shape (100 TB): ONE corpus-sized explode; the per-(doc, bigram)
    count is map-combinable (a doc's bigrams are born co-located in its
    row); the corpus bigram model reuses that relation (``sum(n)`` by
    bigram — vocabulary²-bounded, NOT corpus-sized) and the context
    relation reuses the model (vocabulary-bounded). The scoring join
    shuffles the (doc, bigram)-distinct relation by bigram; the context
    join keys a vocabulary-sized relation. Nothing is collected."""
    from shaclapi_spark.pipeline.text import word_ngrams

    bg = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), 2)).alias("bigram")
    )
    # persist point: tf feeds three consumers (the scoring join's left side,
    # the bigram model, and — through the model — the context relation), and
    # Catalyst duplicates self-join lineage rather than sharing it, so
    # without the persist the corpus-sized explode runs 3x (plan-asserted in
    # test_plans). Same discipline as dedup.minhash_lsh_neardups' sigs/cand.
    tf = bg.groupBy(id_col, "bigram").agg(F.count(F.lit(1)).alias("n")).persist()
    model = tf.groupBy("bigram").agg(F.sum("n").cast("long").alias("cnt"))
    model = model.withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
    ctx = model.groupBy("w1").agg(F.sum("cnt").cast("long").alias("ctx"))
    scored = (
        tf.join(model, "bigram")
        .join(ctx, "w1")
        .withColumn(
            "sur",
            (F.length(F.expr("bin(ctx DIV cnt)")) - F.lit(1)).cast("long"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.sum(F.col("n") * F.col("sur")).cast("long").alias("surprisal_sum"),
    )
    out = docs.select(id_col).distinct().join(per_doc, id_col, "left")
    return out.select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("surprisal_sum"), F.lit(0)).alias("surprisal_sum"),
        F.when(
            F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
            F.col("surprisal_sum").cast("double")
            / F.col("n_bigrams").cast("double"),
        ).alias("mean_surprisal"),
    )


def source_overlap(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix: for every unordered source pair
    (a < b), how many distinct normalized-content digests appear in BOTH —
    the curation report that decides source precedence before global
    dedup (which mirror is a copy of which, which scrape re-crawled an
    existing corpus). Output: (source_a, source_b, n_shared_digests).

    Scale shape (100 TB): content collapses to a 16-byte md5 digest at the
    scan (text never shuffles); (digest, source) is made distinct by one
    map-combinable aggregation; sources-per-digest collapse to an array
    per digest (sources are a tiny domain, the array is bounded); the
    pair explode runs on the digest relation at |sources|²-bounded
    fan-out; the final pair count is domain²-bounded. Mirrors the exact
    dedup digest discipline of pipeline/dedup.py (16-byte keys on every
    shuffle)."""
    from shaclapi_spark.pipeline.text import normalize_text

    ds = docs.select(
        F.md5(normalize_text(F.col(text_col))).alias("digest"),
        F.col(source_col).alias("src"),
    ).distinct()
    per_digest = ds.groupBy("digest").agg(
        F.array_sort(F.collect_set("src")).alias("srcs")
    )
    # guarded sequences: Spark's sequence(a, b) DESCENDS when a > b, so both
    # levels short-circuit to empty arrays for digests with < 2 sources
    # (same pattern as text.word_ngrams)
    pairs = per_digest.filter(F.size("srcs") >= 2).select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size("srcs") - F.lit(1)),
                    lambda i: F.transform(
                        F.sequence(i + F.lit(1), F.size("srcs")),
                        lambda j: F.struct(
                            F.element_at(F.col("srcs"), i).alias("source_a"),
                            F.element_at(F.col("srcs"), j).alias("source_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_digests"))
    )


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab: int = 500_000,
) -> list:
    """The corpus word-frequency dictionary, bounded to the ``max_vocab``
    most frequent words (ties broken by word, so the cut is deterministic):
    [(word, count)] sorted by (count desc, word asc). This is the ONLY
    corpus-sized pass BPE training needs — one explode + one
    map-combinable aggregation + TakeOrderedAndProject; the collect is
    bounded by ``max_vocab`` regardless of corpus size (the same bounded-
    driver device as IVF's training sample)."""
    from shaclapi_spark.pipeline.text import normalize_text

    words = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda x: x != ""
    )
    rows = (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(int(max_vocab))
        .collect()
    )
    return [(r.word, int(r.n)) for r in rows]


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_vocab: int = 500_000,
) -> list:
    """Byte-pair-encoding tokenizer training: the full merge loop, not just
    the first pair count (``bpe_pair_counts`` is iteration 1 of this).
    Returns the ordered merge table [(left, right), ...] — rank = list
    position, exactly what ``tokenize_bpe`` consumes.

    Classic BPE trains on the word-frequency DICT, not the token stream:
    Spark's one corpus-sized job builds the bounded dict
    (``word_frequencies``), then ``bpe_merge_loop`` is pure driver Python
    over ≤ max_vocab entries — corpus-size-independent by construction,
    the standard architecture (the dict is Zipf-bounded; the loop never
    sees the corpus)."""
    return bpe_merge_loop(word_frequencies(docs, text_col, max_vocab), n_merges)


def bpe_merge_loop(word_counts: list, n_merges: int) -> list:
    """The pure training loop over a [(word, count)] dict. Merge selection
    is deterministic: highest weighted pair count, ties by lexicographic
    pair; stops early when no pairs remain (fully merged vocab), so the
    merge list is PREFIX-STABLE in n_merges (property-tested)."""
    vocab: dict = {}
    for w, c in word_counts:
        t = tuple(w)
        vocab[t] = vocab.get(t, 0) + int(c)
    merges: list = []
    for _ in range(int(n_merges)):
        counts: dict = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict) -> list:
    """Greedy lowest-rank-first BPE encoding of one word (the GPT-2 apply
    algorithm): repeatedly merge every occurrence of the present pair with
    the lowest merge rank."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        merged, out, i = best_pair[0] + best_pair[1], [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == best_pair[0]
                and syms[i + 1] == best_pair[1]
            ):
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def tokenize_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list,
    keep_tokens: bool = True,
) -> DataFrame:
    """Apply a trained BPE merge table to the corpus: per doc,
    (id, n_words, n_tokens[, tokens]) where tokens is the concatenation of
    each word's BPE encoding in order. Iterative merging has no SQL analog
    (like the FFT this stays a library + pytest surface, no DuckDB
    contract oracle), so the hot loop is an Arrow-batched pandas UDF with
    a per-batch WORD CACHE — Zipf means a batch of docs re-encodes the
    same head words constantly, so the cache turns the per-doc cost into
    per-DISTINCT-word cost. The merge table (~n_merges tuples) rides the
    closure; nothing else is shipped.

    Scale shape: embarrassingly parallel scan — no shuffle, no state; the
    output explodes no rows (one row per doc)."""
    from pyspark.sql.functions import pandas_udf

    from shaclapi_spark.pipeline.text import normalize_text

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("struct<n_words: long, n_tokens: long, tokens: array<string>>")
    def encode(texts: pd.Series) -> pd.DataFrame:
        cache: dict = {}
        n_words, n_tokens, toks_col = [], [], []
        for t in texts:
            words = [w for w in (t or "").split(" ") if w]
            toks: list = []
            for w in words:
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    cache[w] = enc
                toks.extend(enc)
            n_words.append(len(words))
            n_tokens.append(len(toks))
            toks_col.append(toks if keep_tokens else None)
        return pd.DataFrame(
            {"n_words": n_words, "n_tokens": n_tokens, "tokens": toks_col}
        )

    return df.select(
        F.col(id_col),
        encode(normalize_text(F.col(text_col))).alias("__e"),
    ).select(
        id_col,
        F.col("__e.n_words").alias("n_words"),
        F.col("__e.n_tokens").alias("n_tokens"),
        *([F.col("__e.tokens").alias("tokens")] if keep_tokens else []),
    )
