"""Training-data pipeline ops over the driver-provided documents/embeddings
tables (sf0.001) + planted near-duplicates for the approximate methods."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from shaclapi_spark.pipeline import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def planted(spark):
    """Docs with planted exact dups and near-dups (mutate a few words)."""
    rows = []
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "and the bird sings in the morning light over the quiet river"
    )
    for i in range(20):
        rows.append((i, base.replace("quick", f"word{i}")))  # near-dups of each other
    rows.append((100, base))
    rows.append((101, base))  # exact dup of 100
    rows.append((102, base + " extra tail words here"))  # near-dup of 100
    for i in range(200, 240):
        rows.append((i, " ".join(f"tok{i}_{j}" for j in range(30))))  # unrelated
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts_match_duckdb(spark, docs):
    got = {
        r.doc_id: r.n_tokens
        for r in docs.select(
            "doc_id", text.token_count(F.col("text")).alias("n_tokens")
        ).collect()
    }
    con = duckdb.connect()
    exp = dict(
        con.execute(
            f"SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) "
            f"FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    assert got == exp


def test_bpe_ish_token_count_matches_duckdb(spark, docs):
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", text.bpe_ish_token_count(F.col("text")).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    exp = dict(
        con.execute(
            "SELECT doc_id, len(list_filter(string_split_regex("
            "trim(lower(text)), '[\\s[:punct:][:digit:]]+'), x -> x <> ''))"
            f" FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    assert got == exp


def test_quality_columns(spark, docs):
    out = text.with_quality(docs).select(
        "doc_id", "n_chars", "n_tokens", "n_punct", "n_stopword_en", "max_token_len"
    )
    rows = out.collect()
    assert all(r.n_chars > 0 and r.n_tokens > 0 for r in rows)
    d = {r.doc_id: r for r in rows}
    con = duckdb.connect()
    n_chars = dict(
        con.execute(
            f"SELECT doc_id, length(text) FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    assert {k: v.n_chars for k, v in d.items()} == n_chars


def test_lang_id_deterministic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in the house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "el perro y la casa es un lugar"),
            (4, "le chien et les chats dans une maison"),
            (5, "xyzzy plugh"),
        ],
        "id long, text string",
    )
    got = {r.id: r.lang for r in df.select("id", text.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "und"}


def test_fingerprint_matches_duckdb(spark, docs):
    got = {r.doc_id: (r.fp_md5, r.min_word_hash) for r in text.fingerprint(docs, "doc_id").collect()}
    con = duckdb.connect()
    exp = {
        r[0]: (r[1], r[2])
        for r in con.execute(f"""
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))),
                   (SELECT min(md5(w)) FROM unnest(string_split(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t(w)
                    WHERE w <> '')
            FROM read_parquet('{SF}/documents.parquet')
        """).fetchall()
    }
    assert got == exp


def test_exact_dedup(spark, planted):
    survivors = {r.doc_id for r in dedup.exact_dedup(planted, "doc_id").collect()}
    assert 100 in survivors and 101 not in survivors
    assert survivors == {r.doc_id for r in planted.collect() if r.doc_id != 101}
    groups = dedup.exact_dup_groups(planted, "doc_id").collect()
    assert len(groups) == 1 and groups[0].n_docs == 2 and groups[0].keep_id == 100


def test_jaccard_pairs_exact(spark, planted):
    pairs = dedup.jaccard_pairs(planted, "doc_id", k=3, threshold=0.8).collect()
    got = {(r.a, r.b): (r.inter, r.size_a, r.size_b) for r in pairs}
    assert (100, 101) in got  # exact dup → jaccard 1.0
    assert (100, 102) in got  # tail-appended near-dup
    # full cross-check vs DuckDB exact jaccard on the same planted rows
    pdf = planted.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = {
        (a, b): (i, sa, sb)
        for a, b, i, sa, sb in con.execute("""
            WITH norm AS (
              SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
              FROM docs),
            sh AS (
              SELECT DISTINCT doc_id,
                substring(t, i, 3) AS s
              FROM norm, unnest(range(1, greatest(length(t) - 2, 1) + 1)) AS u(i)),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2)
            SELECT a, b, i, sa.sz, sb.sz
            FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
            WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8
        """).fetchall()
    }
    assert got == exp


def test_minhash_lsh_recall(spark, planted):
    got = {
        (r.a, r.b)
        for r in dedup.minhash_lsh_neardups(
            planted, "doc_id", n_hashes=32, n_bands=16, k=5, threshold=0.7
        ).collect()
    }
    exact = {
        (r.a, r.b)
        for r in dedup.jaccard_pairs(planted, "doc_id", k=5, threshold=0.7).collect()
    }
    assert (100, 101) in got
    # LSH must be a subset of exact pairs (verification step guarantees it)
    assert got <= exact
    # and with 16 bands × 2 rows recall on ≥0.7 pairs should be near-total
    assert len(got) >= 0.8 * len(exact)


def test_minhash_lsh_max_bucket_noop_on_normal_corpus(spark, planted):
    """A cap larger than every bucket must not change the result (capped ≡
    uncapped on the bench-style fixture) — the stop-bucket device is a
    pure defusal, not a semantic change."""
    kw = dict(n_hashes=32, n_bands=16, k=5, threshold=0.7)
    uncapped = {
        (r.a, r.b)
        for r in dedup.minhash_lsh_neardups(planted, "doc_id", **kw).collect()
    }
    capped = {
        (r.a, r.b)
        for r in dedup.minhash_lsh_neardups(
            planted, "doc_id", max_bucket=10_000, **kw
        ).collect()
    }
    assert capped == uncapped


def test_lsh_candidate_pairs_max_bucket_bounds_degenerate(spark):
    """Degenerate corpus: n identical docs put ALL signatures in the same
    (band, bhash) buckets — uncapped candidates are n*(n-1)/2; a cap must
    drop the hot buckets entirely (anti-join), leaving zero candidates."""
    n = 60
    df = spark.createDataFrame(
        [(i, "exactly the same boilerplate text in every row") for i in range(n)],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(df, "doc_id", n_hashes=32, k=5)
    uncapped = dedup.lsh_candidate_pairs(sigs, n_bands=8, n_hashes=32).count()
    assert uncapped == n * (n - 1) // 2
    capped = dedup.lsh_candidate_pairs(
        sigs, n_bands=8, n_hashes=32, max_bucket=16
    ).count()
    assert capped == 0


def test_neardup_band_geometry_scales_with_corpus():
    """band_bits must grow ~log2(n): pinned at two corpus sizes, plus the
    candidate law — expected random candidates n_bands*n^2/2^(bits+1) stays
    ~linear in n when geometry is auto-derived."""
    nb_small, bits_small = similarity.neardup_band_geometry(20_000, threshold=0.9)
    nb_big, bits_big = similarity.neardup_band_geometry(1_000_000_000, threshold=0.9)
    assert bits_small == 9   # ceil(log2(20000/64))
    assert bits_big == 24    # ceil(log2(1e9/64)) = 24, at the clamp
    assert bits_big > bits_small
    # per-bucket occupancy stays bounded by the target at both sizes
    assert 20_000 / 2**bits_small <= 64
    assert 1_000_000_000 / 2**bits_big <= 64
    # and recall-driven n_bands stays sane (not thousands of bands)
    assert 1 <= nb_small <= 2_000 and 1 <= nb_big <= 20_000


def test_embedding_neardups_max_bucket_and_auto_geometry(spark):
    """Auto geometry (no n_bands/band_bits) + a generous cap must still
    recall planted near-identical pairs; a degenerate all-identical corpus
    with a tight cap must produce zero pairs instead of a quadratic join."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((6, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((100 + i, [float(x) for x in v + rng.standard_normal(32) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_neardups(
            df, "vec_id", "embedding", dim=32, threshold=0.9,
            est_count=12, max_bucket=10_000,
        ).collect()
    }
    assert pairs == {(i, 100 + i) for i in range(6)}
    # degenerate: 40 copies of one vector; cap 8 → hot buckets dropped → 0
    one = [float(x) for x in rng.standard_normal(32)]
    dg = spark.createDataFrame(
        [(i, one) for i in range(40)], "vec_id long, embedding array<float>"
    )
    got = similarity.embedding_neardups(
        dg, "vec_id", "embedding", dim=32, threshold=0.9, max_bucket=8
    ).count()
    assert got == 0


def test_simhash_neardups(spark, planted):
    pairs = {(r.a, r.b): r.hamming for r in dedup.simhash_neardups(planted, "doc_id", max_hamming=3).collect()}
    assert pairs[(100, 101)] == 0  # identical text → identical simhash
    assert all(h <= 3 for h in pairs.values())
    # max_bucket passthrough: a generous cap is a no-op
    capped = {
        (r.a, r.b)
        for r in dedup.simhash_neardups(
            planted, "doc_id", max_hamming=3, max_bucket=10_000
        ).collect()
    }
    assert capped == set(pairs)


def test_brute_force_topk_matches_duckdb(spark, emb):
    q = [float(np.sin(i)) for i in range(64)]
    got = [r.vec_id for r in similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()]
    con = duckdb.connect()
    qs = "[" + ",".join(str(v) for v in q) + "]"
    exp = [
        r[0]
        for r in con.execute(f"""
            SELECT vec_id FROM read_parquet('{SF}/embeddings.parquet')
            ORDER BY list_cosine_similarity(embedding::DOUBLE[], {qs}::DOUBLE[]) DESC, vec_id
            LIMIT 10
        """).fetchall()
    ]
    assert got == exp


def test_ann_lsh_recall(spark, emb):
    q = [float(np.sin(i)) for i in range(64)]
    exact = [r.vec_id for r in similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()]
    approx = [
        r.vec_id
        for r in similarity.ann_lsh_topk(
            emb, "vec_id", "embedding", q, k=10, n_planes=5, multiprobe=2
        ).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_audio_metadata_plumbing(spark, fixture_tables):
    meta = multimodal.audio_metadata(fixture_tables["clips"].limit(200))
    rows = meta.collect()
    assert len(rows) == 200
    ok = [r for r in rows if r.hdr_codec is not None]
    assert len(ok) == 200  # every fixture blob has a valid header
    assert all(r.hdr_sr_hz in (8000, 16000, 22050, 44100, 48000) for r in ok)
    assert all(r.rms is not None and r.rms > 0 for r in ok)


def test_byte_histogram_features(spark, fixture_tables):
    feats = multimodal.byte_histogram_features(
        fixture_tables["clips"].limit(50), "clip_id", "bytes"
    ).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 0.2  # header bytes excluded from range edge


def test_decode_stubs():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.sample_video_frames(b"\x00\x00")


def test_ann_index_matches_on_the_fly(spark, emb, tmp_path):
    q = [float(np.sin(i)) for i in range(64)]
    idx = str(tmp_path / "ann_idx")
    similarity.build_ann_index(
        emb, "vec_id", "embedding", idx, dim=64, n_planes=5, seed=42
    )
    from_index = [
        (r.vec_id, round(r.cosine, 9))
        for r in similarity.ann_index_topk(spark, idx, q, k=10, multiprobe=2).collect()
    ]
    on_the_fly = [
        (r.vec_id, round(r.cosine, 9))
        for r in similarity.ann_lsh_topk(
            emb, "vec_id", "embedding", q, k=10, n_planes=5, seed=42, multiprobe=2
        ).collect()
    ]
    assert from_index == on_the_fly


def test_ann_index_probe_prunes_partitions(spark, emb, tmp_path):
    import os

    from pyspark.sql import functions as F

    q = [float(np.sin(i)) for i in range(64)]
    idx = str(tmp_path / "ann_idx2")
    similarity.build_ann_index(
        emb, "vec_id", "embedding", idx, dim=64, n_planes=5, seed=42
    )
    n_parts = len([d for d in os.listdir(idx) if d.startswith("__bucket=")])
    cand = similarity.ann_index_probe(spark, idx, q, multiprobe=1)
    # partition pruning is visible in the physical plan...
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__bucket" in plan
    # ...and at runtime only the probed partitions' files are touched
    touched = {
        os.path.basename(os.path.dirname(r[0]))
        for r in cand.select(F.input_file_name()).distinct().collect()
    }
    probed_buckets = {
        int(b.split("=")[1]) for b in touched if b.startswith("__bucket=")
    }
    assert len(touched) <= 6  # |probe| = 1 + n_planes at multiprobe=1
    assert len(probed_buckets) == len(touched)
    assert 6 <= n_parts  # the index has more partitions than we probed


def test_embedding_neardups_exact_matches_duckdb(spark, emb):
    got = {
        (r.id_a, r.id_b): round(r.cosine, 9)
        for r in similarity.embedding_neardup_pairs_exact(
            emb, "vec_id", "embedding", 0.4
        ).collect()
    }
    con = duckdb.connect()
    exp = {
        (a, b): round(c, 9)
        for a, b, c in con.execute(f"""
            SELECT a.vec_id, b.vec_id,
                   list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
            FROM read_parquet('{SF}/embeddings.parquet') a
            JOIN read_parquet('{SF}/embeddings.parquet') b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        """).fetchall()
    }
    assert got == exp


def test_embedding_neardups_lsh_equals_exact_on_fixture(spark, emb):
    """The contract-query configuration (seed 42, 32 bands x 4 bits) has LSH
    recall 1.0 at cosine>=0.4 on the driver fixtures; precision is 1.0 by
    construction (every candidate is exact-verified), so LSH == exact."""
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_neardup_pairs_exact(
            emb, "vec_id", "embedding", 0.4
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_neardups(
            emb, "vec_id", "embedding", dim=64, threshold=0.4,
            n_bands=32, band_bits=4, seed=42,
        ).collect()
    }
    assert lsh == exact


def test_embedding_neardups_planted(spark):
    """Planted near-identical vectors must be recalled at the default
    (threshold 0.9) config; unrelated random vectors must not pair up."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((8, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((100 + i, [float(x) for x in v + rng.standard_normal(32) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_neardups(
            df, "vec_id", "embedding", dim=32, threshold=0.9
        ).collect()
    }
    assert pairs == {(i, 100 + i) for i in range(8)}


def test_decontaminate_ngram_overlap(spark):
    from pyspark.sql import Row
    from shaclapi_spark.pipeline import dedup as dd

    eight = "alpha bravo charlie delta echo foxtrot golf hotel"
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro words then {eight} and a tail"),
            Row(doc_id=2, text="completely unrelated text with many words " * 3),
            Row(doc_id=3, text="alpha bravo charlie"),  # <8 words: never flagged
        ]
    )
    bench = spark.createDataFrame([Row(doc_id=100, text=f"leak: {eight} verbatim")])
    bad = {r.doc_id for r in dd.contaminated_ids(corpus, bench).collect()}
    assert bad == {1}
    clean = {r.doc_id for r in dd.decontaminate(corpus, bench).collect()}
    assert clean == {2, 3}


def test_word_ngram_hashes_short_doc_empty(spark):
    from pyspark.sql import Row, functions as F
    from shaclapi_spark.pipeline import dedup as dd

    df = spark.createDataFrame([Row(text="one two three")])
    out = df.select(F.size(dd.word_ngram_hashes(F.col("text"), n=8)).alias("n")).collect()
    assert out[0].n == 0


def test_repetition_columns(spark):
    from pyspark.sql import Row
    from shaclapi_spark.pipeline import text as tx

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam ham spam ham spam ham"),  # 5 bigrams, 2 distinct
            Row(doc_id=2, text="all words here are unique tokens"),
            Row(doc_id=3, text="single"),  # <2 words: zero grams
        ]
    )
    got = {r.doc_id: r for r in tx.with_repetition(df, "text", n=2).collect()}
    assert (got[1].n_grams, got[1].n_distinct_grams) == (5, 2)
    assert got[2].n_grams == got[2].n_distinct_grams == 5
    assert got[3].n_grams == 0 and got[3].n_distinct_grams == 0


def test_ann_batch_probe_all_is_exact(spark, emb):
    from shaclapi_spark.pipeline import similarity as sim

    q = emb.filter(F.col("vec_id") < 3)
    batch = sim.ann_lsh_topk_batch(
        emb, q, "vec_id", "embedding", "vec_id", "embedding",
        dim=64, k=5, multiprobe=None,
    ).collect()
    for qid in (0, 1, 2):
        qvec = [float(x) for x in q.filter(F.col("vec_id") == qid).collect()[0].embedding]
        exact = sim.brute_force_topk(emb, "vec_id", "embedding", qvec, k=5).collect()
        got = sorted((r for r in batch if r.q_id == qid), key=lambda r: r.rank)
        assert [r.vec_id for r in got] == [r.vec_id for r in exact]


def test_ann_batch_multiprobe_recall(spark, emb):
    from shaclapi_spark.pipeline import similarity as sim

    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.vec_id)
        for r in sim.ann_lsh_topk_batch(
            emb, q, "vec_id", "embedding", "vec_id", "embedding",
            dim=64, k=5, multiprobe=None,
        ).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in sim.ann_lsh_topk_batch(
            emb, q, "vec_id", "embedding", "vec_id", "embedding",
            dim=64, k=5, multiprobe=2,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # synthetic embeddings are near-uniform (no planted clusters), the
    # hardest case for hyperplane LSH; the property to pin is that probing
    # 22/64 ≈ 34% of buckets recovers well MORE than 34% of true neighbors
    # (measured ~0.64 — ~2x the random-probe baseline)
    assert recall >= 0.5


def test_ann_batch_broadcasts_probes(spark, emb):
    from shaclapi_spark.pipeline import similarity as sim

    q = emb.filter(F.col("vec_id") < 3)
    plan = (
        sim.ann_lsh_topk_batch(
            emb, q, "vec_id", "embedding", "vec_id", "embedding", dim=64, k=5
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    # corpus must not hash-repartition for the candidate join
    assert "BroadcastHashJoin" in plan


def test_curate_funnel_monotone_and_composed(spark):
    from pyspark.sql import Row
    from shaclapi_spark.pipeline import curate as cu

    eight = "alpha bravo charlie delta echo foxtrot golf hotel"
    filler = " ".join(f"w{i}" for i in range(12))
    rows = [
        Row(doc_id=1, text=f"{filler} one", lang="en"),          # survives all
        Row(doc_id=2, text="too short", lang="en"),              # quality drop
        Row(doc_id=3, text=f"{filler} two", lang="zh"),          # lang drop
        Row(doc_id=4, text=f"{filler} one", lang="en"),          # exact dup of 1
        Row(doc_id=5, text=f"{filler} {eight}", lang="en"),      # contaminated
    ]
    docs = spark.createDataFrame(rows)
    bench = spark.createDataFrame([Row(doc_id=100, text=f"bench {eight} text")])
    curated, funnel = cu.curate(
        docs, bench, keep_langs=("en",), min_tokens=10, max_token_len=30, n=8
    )
    f = {r.stage: r.n_docs for r in funnel.collect()}
    assert f == {"raw": 5, "quality": 4, "lang": 3, "dedup": 2, "decontam": 1}
    counts = [f[s] for s in cu.STAGES]
    assert counts == sorted(counts, reverse=True)  # funnel is monotone
    assert [r.doc_id for r in curated.collect()] == [1]


def test_curate_dispositions_reproduce_funnel(spark):
    from pyspark.sql import functions as F

    from shaclapi_spark.pipeline import curate as cu
    from shaclapi_spark.pipeline import sampling as sp

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dup = docs.filter(F.col("doc_id") % 11 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    corpus = docs.unionByName(dup)
    bench = sp.hash_sample(docs, "doc_id", rate=0.05, salt="bench")
    kwargs = dict(keep_langs=("en", "de"), min_tokens=25, max_token_len=30, n=8)
    disp = cu.curate_dispositions(corpus, bench, **kwargs)
    counts = {r.disposition: r["count"] for r in disp.groupBy("disposition").count().collect()}
    _, funnel = cu.curate(corpus, bench, **kwargs)
    stages = {r.stage: r.n_docs for r in funnel.collect()}
    # every doc has exactly one disposition; grouping reproduces the funnel
    assert sum(counts.values()) == stages["raw"]
    assert counts.get("quality", 0) == stages["raw"] - stages["quality"]
    assert counts.get("lang", 0) == stages["quality"] - stages["lang"]
    assert counts.get("dedup", 0) == stages["lang"] - stages["dedup"]
    assert counts.get("decontam", 0) == stages["dedup"] - stages["decontam"]
    assert counts.get("kept", 0) == stages["decontam"]
