"""Corpus-hygiene operators: decontamination, repetition filtering,
per-group quota sampling."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataquality_ml_spark.operators.decontam import contamination_report
from dataquality_ml_spark.operators.relational import quota_sample
from dataquality_ml_spark.operators.text import repetition_stats


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------
def test_contamination_report_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains bench 5-gram
            (2, "one two three four five six"),  # clean
            (3, "alpha beta gamma delta epsilon"),  # exactly the bench 5-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["n_overlap"] for r in contamination_report(corpus, bench).collect()}
    assert set(rows) == {1, 3}
    assert rows[3] == 1
    # bench has a single 5-gram, so each flagged doc shares exactly one
    assert rows[1] == 1


def test_contamination_short_docs_ignored(spark):
    """Docs below shingle length (k=5 tokens) can never be flagged."""
    corpus = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    assert contamination_report(corpus, bench).count() == 0


# ---------------------------------------------------------------------------
# Repetition stats
# ---------------------------------------------------------------------------
def test_repetition_flags_degenerate_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # one token repeated
            (2, "a quick brown fox jumps over lazy dogs"),  # all distinct
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["is_repetitive"] and not rows[2]["is_repetitive"]
    assert rows[1]["dup_token_frac"] == round(1 - 1 / 6, 4)
    assert rows[1]["top_bigram_frac"] == 1.0
    assert rows[2]["dup_token_frac"] == 0.0
    # 7 distinct bigrams out of 7 -> top share 1/7
    assert rows[2]["top_bigram_frac"] == round(1 / 7, 4)


def test_repetition_single_token_doc_excluded(spark):
    df = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    assert repetition_stats(df).count() == 0


# ---------------------------------------------------------------------------
# Quota sampling
# ---------------------------------------------------------------------------
def _naive_quota(df, group_col, key, n):
    h = (F.col(key).cast("bigint") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )


def test_quota_sample_matches_naive_window_on_skew(spark):
    """Two-phase hash-cutoff pruning must be lossless vs the naive
    whole-group window, including on a heavily skewed group."""
    rows = [(i, "big") for i in range(2000)] + [(10_000 + i, "small") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in quota_sample(df, "source", "doc_id", 5).collect()
    )
    want = sorted(
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in _naive_quota(df, "source", "doc_id", 5).collect()
    )
    assert got == want
    assert len([g for g in got if g[0] == "big"]) == 5
    assert len([g for g in got if g[0] == "small"]) == 5  # under-full group kept whole


def test_quota_sample_group_smaller_than_quota(spark):
    df = spark.createDataFrame([(1, "s"), (2, "s")], "doc_id long, source string")
    out = quota_sample(df, "source", "doc_id", 10).collect()
    assert len(out) == 2 and {r["sample_rank"] for r in out} == {1, 2}


def test_quota_sample_shortfall_backstop(spark):
    """ADVICE r4: the probabilistic hash cutoff must never silently return
    fewer than quota rows.  margin=0 admits ZERO candidates for every
    large group — the deterministic shortfall check must widen the cutoff
    and still produce the exact naive-window answer."""
    rows = [(i, "big") for i in range(500)] + [(10_000 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in quota_sample(df, "source", "doc_id", 5, margin=0).collect()
    )
    want = sorted(
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in _naive_quota(df, "source", "doc_id", 5).collect()
    )
    assert got == want
    assert len([g for g in got if g[0] == "big"]) == 5


def test_temperature_sample_shortfall_backstop(spark):
    """Same backstop through temperature_sample: margin=0 forces the
    widened re-run; per-group sizes must equal the exact floor quotas."""
    from dataquality_ml_spark.operators.relational import temperature_sample

    rows = [(i, "a") for i in range(400)] + [(1000 + i, "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(df, "source", "doc_id", budget=60, alpha=0.5, margin=0).collect()
    import math

    tw = 400**0.5 + 100**0.5
    by = {}
    for r in out:
        by.setdefault(r["source"], []).append(r["sample_rank"])
    assert len(by["a"]) == min(400, math.floor(60 * 400**0.5 / tw))
    assert len(by["b"]) == min(100, math.floor(60 * 100**0.5 / tw))
    for g in by:
        assert sorted(by[g]) == list(range(1, len(by[g]) + 1))


# ---------------------------------------------------------------------------
# Unigram log-prob quality
# ---------------------------------------------------------------------------
def test_unigram_logprob_rare_tokens_score_lower(spark):
    from dataquality_ml_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [
            (1, "the the the the"),  # all high-frequency
            (2, "the the xqzt wvbn"),  # half rare singletons
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert rows[1]["mean_logprob"] > rows[2]["mean_logprob"]
    assert rows[1]["n_tokens"] == 4
    # doc 1: P(the)=6/8 -> mean log = ln(0.75)
    import math

    assert rows[1]["mean_logprob"] == round(math.log(6 / 8), 4)


# ---------------------------------------------------------------------------
# BLAS cluster pair similarity (vectorized near-dup verification)
# ---------------------------------------------------------------------------
def test_cluster_pair_sims_matches_expression_path(spark):
    """The GEMM path must round-match the pure-SQL fold per pair, including
    across block boundaries (block=4 forces multi-block row sweeps)."""
    import random

    from dataquality_ml_spark.operators.similarity import (
        _dot,
        _norm,
        cluster_pair_sims,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 2) for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster int"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in cluster_pair_sims(df, threshold=-1.0, block=4).collect()
    )
    a = df.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        "cluster",
    )
    b = df.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        "cluster",
    )
    want = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.round(
                    _dot(F.col("ea"), F.col("eb"))
                    / (_norm(F.col("ea")) * _norm(F.col("eb"))),
                    4,
                )
                + F.lit(0.0)
            ).alias("cos_sim"),
        )
        .collect()
    )
    assert len(got) == len(want) == 2 * (15 * 14 // 2)
    assert got == want


def test_cluster_pair_sims_threshold_and_singleton(spark):
    from dataquality_ml_spark.operators.similarity import cluster_pair_sims

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.001], 0),  # ~identical to 1
            (3, [0.0, 1.0], 0),  # orthogonal
            (9, [1.0, 1.0], 5),  # singleton cluster -> no pairs
        ],
        "vec_id long, embedding array<double>, cluster int",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cluster_pair_sims(df, 0.9).collect()}
    assert pairs == {(1, 2)}


# ---------------------------------------------------------------------------
# Chunking + sequence packing
# ---------------------------------------------------------------------------
def test_chunk_documents_overlap_and_short_doc(spark):
    from dataquality_ml_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 toks: chunks at 1, 5, 9
            (2, "a b"),  # shorter than one chunk -> itself
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk=6, overlap=2).collect()
    )
    assert rows[0] == (1, 0, 6, "w0 w1 w2 w3 w4 w5")
    assert rows[1] == (1, 1, 6, "w4 w5 w6 w7 w8 w9")
    # start 9 > len-overlap=8 is not emitted; exactly 2 full chunks
    assert [r for r in rows if r[0] == 1][-1][1] == 1
    assert rows[-1] == (2, 0, 2, "a b")
    # every adjacent chunk pair shares exactly `overlap` tokens
    assert rows[0][3].split()[-2:] == rows[1][3].split()[:2]


def test_pack_sequences_matches_naive_prefix_sum(spark):
    from dataquality_ml_spark.operators.packing import pack_sequences

    rows = [(i, 10 + (i * 7) % 13) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(8)
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, budget=64).collect()
    }
    acc = 0
    for i, n in rows:
        assert got[i] == (acc // 64, acc % 64), f"doc {i}"
        acc += n
    assert len(got) == 500


# ---------------------------------------------------------------------------
# Distributed k-means
# ---------------------------------------------------------------------------
def test_kmeans_recovers_planted_clusters(spark):
    """Three well-separated planted blobs must each map to one k-means
    cluster (whatever the cluster ids are) after 3 iterations."""
    import random

    from dataquality_ml_spark.operators.similarity import kmeans_assign, kmeans_fit

    rng = random.Random(11)
    blobs = [(-10.0, -10.0), (0.0, 10.0), (10.0, -5.0)]
    rows = [
        (i, [bx + rng.gauss(0, 0.5), by + rng.gauss(0, 0.5)])
        for i in range(90)
        for (bx, by) in [blobs[i % 3]]
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=3, iters=3)
    assert len(cents) == 3 and all(len(c) == 2 for c in cents)
    got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, cents).collect()}
    for b in range(3):
        members = {got[i] for i in range(90) if i % 3 == b}
        assert len(members) == 1, f"blob {b} split across clusters {members}"
    assert len({got[b] for b in (0, 1, 2)}) == 3, "blobs merged"


# ---------------------------------------------------------------------------
# Interval join
# ---------------------------------------------------------------------------
def test_interval_join_bucket_boundaries(spark):
    """Points exactly at start (inclusive), end (exclusive), and intervals
    spanning multiple buckets must all resolve correctly."""
    from dataquality_ml_spark.operators.interval import interval_join

    pts = spark.createDataFrame(
        [(1, 1000.0), (2, 4600.0), (3, 8200.0), (4, 999.9)],
        "pid long, t double",
    )
    iv = spark.createDataFrame(
        [(10, 1000.0, 8200.0)], "iid long, s double, e double"
    )  # spans 3 hour-buckets
    got = sorted(
        r["pid"]
        for r in interval_join(pts, iv, "t", "s", "e", 3600).collect()
    )
    # 1: t==start -> in; 2: mid -> in; 3: t==end -> OUT (exclusive); 4: before
    assert got == [1, 2]


def test_interval_join_left_keeps_unmatched(spark):
    from dataquality_ml_spark.operators.interval import interval_join

    pts = spark.createDataFrame([(1, 50.0), (2, 500.0)], "pid long, t double")
    iv = spark.createDataFrame([(7, 0.0, 100.0)], "iid long, s double, e double")
    rows = {r["pid"]: r["iid"] for r in interval_join(pts, iv, "t", "s", "e", 60, how="left").collect()}
    assert rows == {1: 7, 2: None}


def test_interval_join_plan_is_hash_join(spark):
    """The manufactured bucket key must turn the range join into an
    equi-join — no BroadcastNestedLoopJoin / CartesianProduct in the plan."""
    from dataquality_ml_spark.operators.interval import interval_join

    pts = spark.range(100).selectExpr("id as pid", "cast(id * 60 as double) as t")
    iv = spark.range(10).selectExpr(
        "id as iid", "cast(id * 600 as double) as s", "cast(id * 600 + 300 as double) as e"
    )
    plan = (
        interval_join(pts, iv, "t", "s", "e", 600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan


def test_sample_hash_string_key_conserves_rows(spark):
    """String keys hash via md5 (not a silent NULL-drop bigint cast):
    sample(p) + complement == all rows, and 100% keeps everything."""
    from dataquality_ml_spark.operators.relational import _hash_bucket, sample_hash

    df = spark.createDataFrame(
        [(f"doc-{i}", i) for i in range(500)], "doc_key string, v int"
    )
    assert sample_hash(df, "doc_key", 100).count() == 500
    kept = sample_hash(df, "doc_key", 10)
    n_kept = kept.count()
    assert 0 < n_kept < 500  # the old cast path returned 0 rows
    cutoff = int(4294967296 * 10 / 100)
    comp = df.where(_hash_bucket(df, "doc_key") >= cutoff)
    assert n_kept + comp.count() == 500


def test_quota_sample_string_key(spark):
    from dataquality_ml_spark.operators.relational import quota_sample as qs

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"k-{i}") for i in range(300)], "grp string, key string"
    )
    out = qs(df, "grp", "key", 5).collect()
    assert len(out) == 15  # 5 per group, none NULL-dropped
    assert {r["grp"] for r in out} == {"g0", "g1", "g2"}


def test_simhash_hamming_banding_matches_exact(spark):
    """Banded LSH recall check on a small corpus: pairs found by banding +
    verify == pairs found by exact quadratic bit_count(xor) <= k."""
    from itertools import combinations

    from dataquality_ml_spark.operators.dedup import simhash, simhash_hamming_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "the quick brown fox jumps over the lazy dog again and again tonight",
        "completely different text about spark shuffles and partitions at scale",
        "another unrelated document mentioning joins aggregates and windows",
        "the quick brown fox jumps over the lazy dog again and again today",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    k = 3
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_hamming_pairs(df, k=k).collect()
    }
    fps = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    want = set()
    for a, b in combinations(sorted(fps), 2):
        d = bin(fps[a] ^ fps[b]).count("1")
        if d <= k:
            want.add((a, b, d))
    assert got == want
    assert any(h == 0 for _, _, h in got)  # the planted exact dup


def test_incremental_dedup_bloom_matches_exact(spark):
    """The Bloom scale path vs the exact anti-join: nothing already in the
    corpus survives (no false negatives by construction), and at this bloom
    size no new doc is falsely dropped either — results are identical."""
    from dataquality_ml_spark.operators.dedup import (
        build_fingerprint_bloom,
        incremental_dedup,
        incremental_dedup_bloom,
    )

    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} with shared words") for i in range(200)],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        # 50 already-seen texts, 50 new, plus an in-batch duplicate pair
        [(1000 + i, f"corpus document number {i} with shared words") for i in range(50)]
        + [(2000 + i, f"brand new document {i}") for i in range(50)]
        + [(3000, "brand new document 0")],
        "doc_id bigint, text string",
    )
    exact = {r["doc_id"] for r in incremental_dedup(batch, corpus).collect()}
    bloom = build_fingerprint_bloom(corpus)
    got = {r["doc_id"] for r in incremental_dedup_bloom(batch, bloom).collect()}
    assert got == exact  # ⊆ always; equal because fp-rate ~ 0 at this size
    assert got == {2000 + i for i in range(50)}  # the 50 new, min-id keeper
    # no already-seen doc ever survives the bloom (false-negative-free)
    assert all(d >= 2000 for d in got)


def test_pq_encode_separates_planted_clusters(spark):
    """PQ with k=2 codewords per subspace must give the two planted
    clusters distinct codes, and ADC must rank same-cluster vectors first."""
    import numpy as np

    from dataquality_ml_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    rng = np.random.default_rng(0)
    rows = []
    for i in range(40):
        center = 5.0 if i % 2 else -5.0  # cluster by parity of vec_id
        rows.append((i, [float(center + v) for v in rng.normal(0, 0.1, 8)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    cbs = pq_train(df, m=2, k=2, iters=2)
    codes = {r["vec_id"]: tuple(r["codes"]) for r in pq_encode(df, cbs).collect()}
    even = {codes[i] for i in range(0, 40, 2)}
    odd = {codes[i] for i in range(1, 40, 2)}
    assert len(even) == 1 and len(odd) == 1 and even != odd

    top = pq_adc_topk(df.where(F.col("vec_id") < 2), codes_df=pq_encode(df, cbs),
                      codebooks=cbs, topk=5)
    for r in top.collect():
        # every retrieved neighbor shares the query's parity cluster
        assert r["neighbor_id"] % 2 == r["query_id"] % 2


def test_mixture_sample_budget_and_proportions(spark):
    """Every source stays within its token allocation; the cutoff form
    equals the naive full-window form; zero-weight sources are excluded."""
    from dataquality_ml_spark.operators.packing import mixture_sample

    rows = [
        (i, ["web", "books", "junk"][i % 3], "tok " * (5 + i % 7))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    weights = {"web": 3.0, "books": 1.0}  # junk: no weight -> excluded
    budget = 400
    out = mixture_sample(df, weights, token_budget=budget).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) <= {"web", "books"}
    alloc = {"web": budget * 3 / 4, "books": budget * 1 / 4}
    for s, rs in by_src.items():
        assert max(r["cum_tokens"] for r in rs) <= alloc[s]
        # running sum is consistent: cum == sorted prefix sums of n_tokens
        rs_sorted = sorted(rs, key=lambda r: r["cum_tokens"])
        acc = 0
        for r in rs_sorted:
            acc += r["n_tokens"]
            assert r["cum_tokens"] == acc
    # ~3:1 token split between web and books (within one doc's tokens)
    web_t = sum(r["n_tokens"] for r in by_src["web"])
    books_t = sum(r["n_tokens"] for r in by_src["books"])
    assert abs(web_t - alloc["web"]) <= 12 and abs(books_t - alloc["books"]) <= 12


def test_bloom_null_text_parity_and_saturation_guard(spark):
    """Null-text docs fingerprint as md5('') in BOTH paths (bow_fingerprint
    never yields NULL), so null-text batch docs dedup against a null/empty-
    text corpus doc identically through the bloom and the exact anti-join;
    and an overloaded filter refuses to build rather than silently dropping
    new docs."""
    import pytest as _pytest

    from dataquality_ml_spark.operators.dedup import (
        build_fingerprint_bloom,
        incremental_dedup,
        incremental_dedup_bloom,
    )

    corpus = spark.createDataFrame(
        [(0, "known doc"), (1, None)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame(
        [(10, "known doc"), (11, None), (12, None), (13, "fresh doc")],
        "doc_id bigint, text string",
    )
    exact = {r["doc_id"] for r in incremental_dedup(batch, corpus).collect()}
    bloom = build_fingerprint_bloom(corpus)
    got = {r["doc_id"] for r in incremental_dedup_bloom(batch, bloom).collect()}
    # 10 and the null-text 11/12 match corpus content; only 13 is new —
    # and the two paths agree exactly
    assert got == exact == {13}
    # without a null-text corpus doc, null-text batch docs ARE new: the
    # min-id keeper survives both paths
    corpus2 = corpus.where(F.col("text").isNotNull())
    exact2 = {r["doc_id"] for r in incremental_dedup(batch, corpus2).collect()}
    bloom2 = build_fingerprint_bloom(corpus2)
    got2 = {r["doc_id"] for r in incremental_dedup_bloom(batch, bloom2).collect()}
    assert got2 == exact2 == {11, 13}

    # 64-bit filter over 200 distinct fingerprints: fill >> 0.5 -> refuse
    big = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(200)], "doc_id bigint, text string"
    )
    with _pytest.raises(ValueError, match="over capacity"):
        build_fingerprint_bloom(big, num_bits=64, num_hashes=3)


def test_bloom_tree_reduce_large_bitmap_many_partitions(spark):
    """VERDICT r3 item 2: the bitmap OR-reduction must scale past the old
    driver collect — a 64 Mi-bit (8 MiB) filter built from a corpus spread
    over 64 partitions goes through the executor-side tree reduction and
    yields EXACTLY the bitmap a single-partition build produces, with
    membership semantics intact."""
    from dataquality_ml_spark.functions.scalar import bow_fingerprint
    from dataquality_ml_spark.operators.dedup import (
        FingerprintBloom,
        bitmap_from_positions,
        build_fingerprint_bloom,
        incremental_dedup_bloom,
    )

    corpus = spark.range(2000).selectExpr(
        "id AS doc_id", "concat('tree reduce corpus doc ', id) AS text"
    )
    num_bits = 1 << 26  # 64 Mi bits = 8 MiB bitmap per partition
    proto = FingerprintBloom(b"", num_bits, 5)
    pos = corpus.select(
        proto.position_cols(bow_fingerprint("text")).alias("pos")
    )
    wide = bitmap_from_positions(pos.repartition(64), num_bits)
    narrow = bitmap_from_positions(pos.coalesce(1), num_bits)
    assert wide == narrow  # tree reduction == serial build, bit for bit
    assert len(wide) == num_bits // 8

    bloom = build_fingerprint_bloom(corpus.repartition(64), num_bits=num_bits)
    # every corpus doc is claimed seen; a genuinely-new batch survives
    seen_batch = corpus.limit(50)
    assert incremental_dedup_bloom(seen_batch, bloom).count() == 0
    fresh = spark.range(5).selectExpr(
        "id + 9000 AS doc_id", "concat('unseen doc ', id) AS text"
    )
    assert incremental_dedup_bloom(fresh, bloom).count() == 5


def test_knn_ivf_multiprobe_recovers_boundary_neighbors(spark):
    """VERDICT r3 item 3: a query sitting near the Voronoi edge between two
    clusters has its true nearest neighbor in the OTHER cluster; probe=1
    misses it silently, nprobe=2 recovers it, and recall vs brute force is
    monotone in the probe count."""
    import math

    from dataquality_ml_spark.operators.similarity import (
        centroids_by_label,
        knn_bruteforce,
        knn_ivf,
    )

    # unit vectors by angle: cluster 'a' hugs 0°, cluster 'b' hugs 90°.
    # vec 3 (43°) is the boundary query: angularly assigned to 'a', but its
    # nearest neighbor is vec 4 (50°) which belongs to 'b'.
    angles = {0: (0, "a"), 1: (5, "a"), 2: (10, "a"), 3: (43, "a"),
              4: (50, "b"), 5: (80, "b"), 6: (85, "b"), 7: (90, "b")}
    rows = [
        (i, lab, [math.cos(math.radians(deg)), math.sin(math.radians(deg))])
        for i, (deg, lab) in angles.items()
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, label string, embedding array<float>")
    cents = centroids_by_label(df)
    q = df.where(F.col("vec_id") == 3)

    exact = {r["neighbor_id"] for r in knn_bruteforce(df, q, k=3).collect()}
    got1 = {r["neighbor_id"] for r in knn_ivf(df, q, cents, k=3, nprobe=1).collect()}
    got2 = {r["neighbor_id"] for r in knn_ivf(df, q, cents, k=3, nprobe=2).collect()}

    assert 4 in exact            # the planted cross-cluster neighbor
    assert 4 not in got1         # probe=1 never sees cluster 'b'
    assert 4 in got2             # probe=2 recovers it
    recall1 = len(got1 & exact) / len(exact)
    recall2 = len(got2 & exact) / len(exact)
    assert recall2 > recall1
    assert got2 == exact         # with both clusters probed, ANN is exact here


def test_ivf_pq_multiprobe_and_kmeans_probe_assign(spark):
    """kmeans_probe_assign emits nprobe (cluster, probe) rows per vector —
    probe 1 equal to the argmin assignment — and ivf_pq_topk(nprobe=2)
    recovers a planted boundary neighbor that probe=1 loses."""
    from dataquality_ml_spark.operators.similarity import (
        ivf_pq_topk,
        kmeans_assign,
        kmeans_probe_assign,
        pq_train,
    )

    xs = {0: 0.0, 1: 1.0, 2: 2.0, 3: 4.4, 4: 5.2, 5: 9.0, 6: 10.0}
    df = spark.createDataFrame(
        [(i, [x, 0.0]) for i, x in xs.items()], "vec_id bigint, embedding array<float>"
    )
    coarse = [[1.0, 0.0], [8.0, 0.0]]  # query 3 (x=4.4) assigns to cluster 0

    one = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, coarse).collect()}
    probes = kmeans_probe_assign(df, coarse, nprobe=2).collect()
    first = {r["vec_id"]: r["cluster"] for r in probes if r["probe"] == 1}
    assert first == one  # probe 1 == the argmin assignment
    per_vec = {}
    for r in probes:
        per_vec.setdefault(r["vec_id"], set()).add(r["cluster"])
    assert all(v == {0, 1} for v in per_vec.values())  # both clusters, no dups

    cbs = pq_train(df, m=2, k=4, iters=2)
    q = df.where(F.col("vec_id") == 3)
    got1 = {r["neighbor_id"] for r in ivf_pq_topk(df, q, coarse, cbs, topk=2).collect()}
    got2 = {
        r["neighbor_id"]
        for r in ivf_pq_topk(df, q, coarse, cbs, topk=2, nprobe=2).collect()
    }
    # vec 4 (x=5.2) is the true nearest neighbor but lives in cluster 1
    assert 4 not in got1
    assert 4 in got2


def test_ivf_pq_refine_reranks_with_true_cosine(spark):
    """The refine step re-ranks the ADC shortlist by TRUE cosine: with the
    shortlist covering the probed cluster, refine's top-k must equal the
    brute-force top-k restricted to that cluster — quantization error can
    no longer reorder the final ranking."""
    from dataquality_ml_spark.operators.similarity import (
        ivf_pq_refine_topk,
        ivf_pq_topk,
        kmeans_assign,
        knn_bruteforce,
        pq_train,
    )

    # 4-dim vectors, one tight cluster near the origin plus a far cluster;
    # coarse k=2 with explicit centroids keeps the query in cluster 0
    rows = [
        (0, [1.0, 0.1, 0.0, 0.0]),   # query
        (1, [0.9, 0.3, 0.1, 0.0]),
        (2, [1.0, 0.0, 0.3, 0.1]),
        (3, [0.8, 0.4, 0.0, 0.2]),
        (4, [1.1, 0.2, 0.2, 0.0]),
        (5, [9.0, 8.0, 7.0, 9.0]),
        (6, [8.0, 9.0, 9.0, 8.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    coarse = [[1.0, 0.2, 0.1, 0.1], [8.5, 8.5, 8.0, 8.5]]
    cbs = pq_train(df, m=2, k=2, iters=2)
    q = df.where(F.col("vec_id") == 0)

    refined = ivf_pq_refine_topk(df, q, coarse, cbs, topk=3, shortlist=10).collect()
    # exact ranking among the query's own cluster members
    cluster0 = {r["vec_id"] for r in kmeans_assign(df, coarse).collect() if r["cluster"] == 0}
    bf = [
        r
        for r in knn_bruteforce(df, q, k=6).collect()
        if r["neighbor_id"] in cluster0
    ][:3]
    assert [r["neighbor_id"] for r in refined] == [r["neighbor_id"] for r in bf]
    assert [r["sim"] for r in refined] == [r["sim"] for r in bf]  # true cosine
    # and the ADC ordering genuinely can differ (2 codewords per subspace
    # quantize hard) — refine is not a no-op re-sort of the same numbers
    adc = ivf_pq_topk(df, q, coarse, cbs, topk=3).collect()
    assert {r["neighbor_id"] for r in adc} <= cluster0


def test_pq_train_ignores_null_vectors(spark):
    """A null embedding row must not crash the fused trainer or perturb
    the codebooks (kmeans_fit's plain posexplode silently drops nulls;
    the fused path guards explicitly)."""
    from dataquality_ml_spark.operators.similarity import kmeans_fit, pq_train

    base = [(i, [float(i), 0.0, float(i % 3), 1.0]) for i in range(1, 9)]
    clean = spark.createDataFrame(base, "vec_id bigint, embedding array<float>")
    dirty = clean.unionByName(
        spark.createDataFrame([(99, None)], "vec_id bigint, embedding array<float>")
    )
    assert pq_train(dirty, m=2, k=2, iters=2) == pq_train(clean, m=2, k=2, iters=2)
    # kmeans_fit shares the hash-smallest init: a null row must not be able
    # to seed (previously a crash when it ranked inside the top-k)
    assert kmeans_fit(dirty, k=2, iters=1) == kmeans_fit(clean, k=2, iters=1)


# ---------------------------------------------------------------------------
# Sub-document span dedup (Lee et al. keep-first / Gopher remove-all)
# ---------------------------------------------------------------------------
def _span_frame(spark):
    # spans: "a b c" appears 3x (docs 1,2,3); "x y z" once; "q r s" twice
    return spark.createDataFrame(
        [
            (1, 0, "a b c"),
            (1, 1, "x y z"),
            (2, 0, "a b c"),
            (2, 1, "q r s"),
            (3, 0, "q r s"),
            (3, 1, "a b c"),
        ],
        "doc_id long, chunk_idx long, chunk_text string",
    )


def test_dedup_spans_keep_first(spark):
    from dataquality_ml_spark.operators.dedup import dedup_spans

    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["span_count"], r["kept"])
        for r in dedup_spans(_span_frame(spark)).collect()
    }
    assert rows[(1, 0)] == (3, True)   # global first occurrence of "a b c"
    assert rows[(2, 0)] == (3, False)
    assert rows[(3, 1)] == (3, False)
    assert rows[(1, 1)] == (1, True)   # unique span untouched
    assert rows[(2, 1)] == (2, True)   # first "q r s"
    assert rows[(3, 0)] == (2, False)


def test_dedup_spans_remove_all_and_min_count(spark):
    from dataquality_ml_spark.operators.dedup import dedup_spans

    df = _span_frame(spark)
    # Gopher-style: every copy of a repeated span goes
    kept = {
        (r["doc_id"], r["chunk_idx"]): r["kept"]
        for r in dedup_spans(df, keep_first=False).collect()
    }
    assert kept == {
        (1, 0): False, (2, 0): False, (3, 1): False,
        (1, 1): True, (2, 1): False, (3, 0): False,
    }
    # min_count=4: nothing repeats often enough, all kept
    assert all(
        r["kept"] for r in dedup_spans(df, min_count=4).collect()
    )


def test_reconstruct_spans_orders_and_counts(spark):
    from dataquality_ml_spark.operators.dedup import dedup_spans, reconstruct_spans

    out = {
        r["doc_id"]: r
        for r in reconstruct_spans(dedup_spans(_span_frame(spark))).collect()
    }
    assert out[1]["clean_text"] == "a b c x y z"
    assert out[2]["clean_text"] == "q r s"
    assert out[3]["clean_text"] == ""           # every span was a later copy
    assert out[3]["n_spans"] == 2 and out[3]["n_removed"] == 2
    assert out[2]["n_removed"] == 1


# ---------------------------------------------------------------------------
# SemDeDup (embedding-cluster semantic dedup)
# ---------------------------------------------------------------------------
def test_semdedup_planted_duplicates(spark):
    from dataquality_ml_spark.operators.similarity import semdedup

    # two well-separated clusters; ids 1,2 are near-identical, 3 is distinct
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.01]),   # semantic dup of 1
            (3, [0.6, 0.8]),      # same half-space, below tau=0.95
            (4, [-1.0, 0.0]),
            (5, [-0.999, -0.02]), # semantic dup of 4
        ],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    rows = {r["vec_id"]: r for r in semdedup(df, cents, tau=0.95).collect()}
    assert rows[1]["kept"] and rows[1]["dup_of"] is None
    assert not rows[2]["kept"] and rows[2]["dup_of"] == 1
    assert rows[3]["kept"]            # similar direction but below tau
    assert rows[4]["kept"]
    assert not rows[5]["kept"] and rows[5]["dup_of"] == 4
    # clusters never mix: 2's witness is 1, never the opposite-cluster 4
    assert rows[2]["cluster"] != rows[4]["cluster"]


def test_semdedup_witness_rule_chain(spark):
    """Documented one-pass semantics: in a chain a~b~c (a!~c), BOTH b and
    c are evicted — c's witness is b even though b itself is evicted."""
    import math

    from dataquality_ml_spark.operators.similarity import semdedup

    def unit(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    # cos(20deg)=0.94 > tau, cos(40deg)=0.766 < tau
    df = spark.createDataFrame(
        [(1, unit(0)), (2, unit(20)), (3, unit(40))],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r for r in semdedup(df, [unit(20)], tau=0.9).collect()
    }
    assert rows[1]["kept"]
    assert not rows[2]["kept"] and rows[2]["dup_of"] == 1
    assert not rows[3]["kept"] and rows[3]["dup_of"] == 2


def test_semdedup_null_vector_kept(spark):
    from dataquality_ml_spark.operators.similarity import semdedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None)],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in semdedup(df, [[1.0, 0.0]], tau=0.9).collect()}
    assert rows[3]["kept"] and rows[3]["dup_of"] is None
    assert not rows[2]["kept"]


# ---------------------------------------------------------------------------
# Leakage-safe split
# ---------------------------------------------------------------------------
def test_leakage_safe_split_groups_never_straddle(spark):
    from dataquality_ml_spark.operators.relational import leakage_safe_split

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(70)], "doc_id long, keep_id long"
    )
    out = leakage_safe_split(df, "keep_id").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["keep_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())
    assert {r["split"] for r in out} <= {"train", "val", "test"}


def test_leakage_safe_split_stable_under_growth(spark):
    """A group's split never changes when other groups are added."""
    from dataquality_ml_spark.operators.relational import leakage_safe_split

    small = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, keep_id long")
    big = spark.createDataFrame(
        [(1, 10), (2, 20)] + [(i, i * 100) for i in range(3, 50)],
        "doc_id long, keep_id long",
    )
    s1 = {r["keep_id"]: r["split"] for r in leakage_safe_split(small, "keep_id").collect()}
    s2 = {r["keep_id"]: r["split"] for r in leakage_safe_split(big, "keep_id").collect()}
    assert s1 == {k: s2[k] for k in s1}


def test_leakage_safe_split_custom_fractions_and_validation(spark):
    import pytest as _pytest

    from dataquality_ml_spark.operators.relational import leakage_safe_split

    df = spark.createDataFrame([(i, i) for i in range(200)], "doc_id long, keep_id long")
    out = leakage_safe_split(df, "keep_id", {"train": 0.5, "test": 0.5}).collect()
    frac = sum(r["split"] == "train" for r in out) / len(out)
    assert 0.35 < frac < 0.65
    with _pytest.raises(ValueError):
        leakage_safe_split(df, "keep_id", {"train": 0.5, "test": 0.2})


# ---------------------------------------------------------------------------
# Embedding health profile
# ---------------------------------------------------------------------------
def test_embedding_profile_planted_pathologies(spark):
    from dataquality_ml_spark.operators.similarity import embedding_profile

    df = spark.createDataFrame(
        [
            (1, [1.0, 5.0, 0.0]),
            (2, [3.0, 5.0, 0.0]),   # dim1 collapsed, dim2 all-zero
            (3, [0.0, 0.0, 0.0]),   # zero vector
            (4, None),              # null vector
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r["pos"]: r for r in embedding_profile(df).collect()}
    assert set(rows) == {-1, 0, 1, 2}
    # dim2 is collapsed AND all-zero: zero std, degenerate range, full zero frac
    assert rows[2]["std"] == 0.0 and rows[2]["min"] == rows[2]["max"] == 0.0
    assert rows[2]["frac_zero"] == 1.0
    assert rows[1]["frac_zero"] == round(1 / 3, 4)  # only the zero vector
    assert rows[0]["n"] == 3                      # null vector contributes no dims
    norm = rows[-1]
    assert norm["n"] == 3                         # non-null vectors only
    assert abs(norm["frac_zero"] - round(1 / 3, 4)) < 1e-9  # one zero vector
    assert norm["min"] == 0.0 and norm["max"] > 5.0


def test_semdedup_centroid_far_keeps_least_typical(spark):
    """Paper keep rule: in a dup pair the member FARTHER from the centroid
    survives — the opposite outcome of min_id when the lower id is the
    more typical one."""
    from dataquality_ml_spark.operators.similarity import semdedup

    # centroid [1, 0]; id 1 sits ON the centroid (csim 1.0), id 2 slightly
    # off (csim < 1) — near-identical pair, so one must go
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.995, 0.0999])],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0]]
    far = {r["vec_id"]: r for r in semdedup(df, cents, tau=0.95, keep="centroid_far").collect()}
    assert far[2]["kept"] and far[2]["dup_of"] is None
    assert not far[1]["kept"] and far[1]["dup_of"] == 2
    near = {r["vec_id"]: r for r in semdedup(df, cents, tau=0.95).collect()}
    assert near[1]["kept"] and not near[2]["kept"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        semdedup(df, cents, keep="nope")


def test_span_dedup_randomized_vs_python_reference(spark):
    """Differential test: for random small-vocab corpora (heavy natural
    duplication), the distributed decision + reconstruction must equal a
    direct single-process implementation of the policy, under both keep
    policies."""
    import random

    from dataquality_ml_spark.operators.dedup import dedup_spans, reconstruct_spans
    from dataquality_ml_spark.operators.text import chunk_documents

    rng = random.Random(13)
    vocab = ["a", "b", "c"]
    for trial, keep_first in [(0, True), (1, True), (2, False)]:
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
            for i in range(40)
        ]
        # python reference: tile into 3-token spans, global keep-first
        spans = []
        for did, text in docs:
            toks = text.split()
            tiled = [
                " ".join(toks[s : s + 3]) for s in range(0, max(len(toks), 1), 3)
            ]
            for pos, sp in enumerate(tiled):
                spans.append((did, pos, sp))
        counts: dict[str, int] = {}
        first: dict[str, tuple[int, int]] = {}
        for did, pos, sp in sorted(spans):
            counts[sp] = counts.get(sp, 0) + 1
            first.setdefault(sp, (did, pos))
        want = {}
        for did, text in docs:
            mine = [(p, s) for d, p, s in spans if d == did]
            kept = [
                s
                for p, s in mine
                if counts[s] < 2 or (keep_first and first[s] == (did, p))
            ]
            want[did] = (
                " ".join(kept),
                len(mine) - len(kept),
            )

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in reconstruct_spans(
                dedup_spans(
                    chunk_documents(df, chunk=3, overlap=0),
                    keep_first=keep_first,
                )
            ).collect()
        }
        assert got == want, f"trial {trial} mismatch"


def test_dedup_spans_null_span_kept_not_dropped(spark):
    """A caller-split frame can carry null span text; those rows must come
    back kept (count 1), not vanish through the null join key."""
    from dataquality_ml_spark.operators.dedup import dedup_spans

    df = spark.createDataFrame(
        [(1, 0, "a b c"), (1, 1, None), (2, 0, None), (2, 1, "a b c")],
        "doc_id long, chunk_idx long, chunk_text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["span_count"], r["kept"])
        for r in dedup_spans(df).collect()
    }
    assert len(rows) == 4                       # nothing dropped
    assert rows[(1, 1)] == (1, True) and rows[(2, 0)] == (1, True)
    assert rows[(1, 0)] == (2, True) and rows[(2, 1)] == (2, False)


def test_dedup_spans_plan_is_window_free_with_partial_agg(spark):
    """The skew contract: the decision plan must contain NO window exec
    (a per-span sort task cannot be skew-split) and must compute the
    span stats through a two-phase aggregate (partial before the
    exchange), plus survive an actual hot key: one span repeated 50k
    times across partitions."""
    from dataquality_ml_spark import plans
    from dataquality_ml_spark.operators.dedup import dedup_spans

    hot = [(i, 0, "the cookie banner") for i in range(50_000)]
    cold = [(i, 1, f"unique span {i}") for i in range(100)]
    df = spark.createDataFrame(
        hot + cold, "doc_id long, chunk_idx long, chunk_text string"
    ).repartition(16)
    out = dedup_spans(df)
    plan = plans.formatted_plan(out)
    assert "Window" not in plan
    # SortAggregate/HashAggregate appear once per phase per branch;
    # at least two phases must exist for the stats branch
    assert plan.count("Aggregate") >= 2
    kept_hot = [r for r in out.where("chunk_text = 'the cookie banner'").collect() if r["kept"]]
    assert len(kept_hot) == 1 and kept_hot[0]["doc_id"] == 0
    assert out.where("kept").count() == 101


# ---------------------------------------------------------------------------
# Winnowing (MOSS) fingerprint selection
# ---------------------------------------------------------------------------
def test_winnow_guarantee_and_density(spark):
    """The winnowing guarantee: docs sharing a >= w+k-1 token run share a
    selected fingerprint; and the selected set is much sparser than the
    full k-gram sequence."""
    from dataquality_ml_spark.operators.dedup import (
        winnow_dup_pairs,
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over seven lazy dogs"  # 9 tokens > 7
    df = spark.createDataFrame(
        [
            (1, "intro words here " + shared + " tail one two"),
            (2, "completely different prefix " + shared + " other suffix"),
            (3, "no overlap with anything else at all in this document"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_dup_pairs(df, k=4, w=4, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)

    fps = {r["doc_id"]: r["winnow_fps"] for r in winnow_fingerprints(df).collect()}
    n_tokens = 13
    n_grams = n_tokens - 3
    assert 0 < len(fps[1]) < n_grams  # strictly sparser than the full index


def test_winnow_short_docs(spark):
    from dataquality_ml_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["winnow_fps"] for r in winnow_fingerprints(df, k=4, w=4).collect()}
    assert fps[1] == []          # shorter than one k-gram
    assert len(fps[2]) == 1      # one k-gram -> its own min
    assert len(fps[3]) == 1      # 2-hash seq < w -> single global min


# ---------------------------------------------------------------------------
# Incremental MinHash near-dup (signature-only corpus state)
# ---------------------------------------------------------------------------
def test_incremental_minhash_flags_corpus_near_dup(spark):
    from dataquality_ml_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
        with_hashed_shingles,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(100, base), (101, "totally unrelated corpus document text here sir")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1, base + " lambda"), (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(with_hashed_shingles(corpus))
    out = incremental_minhash_dedup(batch, sigs, threshold=0.5).collect()
    flagged = {(r["doc_id"], r["corpus_id"]): r["est_jaccard"] for r in out}
    assert (1, 100) in flagged and flagged[(1, 100)] >= 0.5
    assert not any(d == 2 for d, _ in flagged)          # genuinely new doc
    assert not any(c == 101 for _, c in flagged)


def test_sig_jaccard_estimate_identical_and_disjoint(spark):
    from dataquality_ml_spark.operators.dedup import (
        minhash_signatures,
        sig_jaccard_estimate,
        with_hashed_shingles,
    )
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"),
         (3, "p q r s t u v w")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(with_hashed_shingles(df)).collect()}
    one = spark.range(1).select(
        sig_jaccard_estimate(F2.lit(sigs[1]), F2.lit(sigs[2])).alias("same"),
        sig_jaccard_estimate(F2.lit(sigs[1]), F2.lit(sigs[3])).alias("diff"),
    ).first()
    assert one["same"] == 1.0
    assert one["diff"] < 0.5


# ---------------------------------------------------------------------------
# Token-distribution drift
# ---------------------------------------------------------------------------
def test_token_drift_alarms_on_shift_only(spark):
    from dataquality_ml_spark.operators.text import token_drift

    a = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    same = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    shifted = spark.createDataFrame(
        [(i, "omega psi chi phi " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    psi_same = sum(
        r["psi_term"] for r in token_drift(a, same, top_k=10).collect()
    )
    psi_shift = sum(
        r["psi_term"] for r in token_drift(a, shifted, top_k=10).collect()
    )
    assert psi_same < 0.01
    assert psi_shift > 0.2
    # one-sided tokens appear from both sides of the full-outer join
    toks = {r["token"] for r in token_drift(a, shifted, top_k=10).collect()}
    assert "alpha" in toks and "omega" in toks


def test_cluster_pair_sims_sub_blocks_bit_identical(spark):
    """The fat-cluster salting path (B sub-blocks, (i<=j) block-pair
    tasks) must return exactly the single-task result — every unordered
    pair once, same rounded sims — including across GEMM block rows."""
    import random

    from dataquality_ml_spark.operators.similarity import cluster_pair_sims

    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(6)], i % 2) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster int"
    )
    plain = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in cluster_pair_sims(df, threshold=-1.0, block=7).collect()
    )
    salted = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in cluster_pair_sims(
            df, threshold=-1.0, block=7, sub_blocks=3
        ).collect()
    )
    assert plain == salted
    assert len(plain) == 2 * (30 * 29 // 2)


def test_bigram_logprob_penalizes_word_salad(spark):
    """Two corpora with IDENTICAL unigram distributions: one with fixed
    transitions, one scrambled — the bigram score must separate them
    where the unigram score cannot."""
    import random

    from dataquality_ml_spark.operators.text import bigram_logprob, unigram_logprob

    rng = random.Random(5)
    phrase = ["alpha", "beta", "gamma", "delta"]
    ordered = [(i, " ".join(phrase * 5)) for i in range(10)]
    salad_words = phrase * 5
    salads = []
    for i in range(10, 20):
        ws = salad_words[:]
        rng.shuffle(ws)
        salads.append((i, " ".join(ws)))
    df = spark.createDataFrame(ordered + salads, "doc_id long, text string")

    uni = {r["doc_id"]: r["mean_logprob"] for r in unigram_logprob(df).collect()}
    assert abs(uni[0] - uni[15]) < 1e-9  # unigram model is blind to order

    big = {r["doc_id"]: r["mean_logprob"] for r in bigram_logprob(df).collect()}
    assert big[0] > big[15]
    assert all(big[o] > big[s] for o in range(3) for s in range(15, 18))


def test_bigram_logprob_short_docs_excluded(spark):
    from dataquality_ml_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two tokens")],
        "doc_id long, text string",
    )
    out = {r["doc_id"] for r in bigram_logprob(df).collect()}
    assert out == {3}


def test_pack_pieces_straddle_and_conservation(spark):
    """A doc straddling a budget boundary splits into correctly-sized
    pieces; piece lengths sum back to every doc's token count and every
    sequence fills to exactly the budget (except the last)."""
    from dataquality_ml_spark.operators.packing import pack_pieces, pack_sequences

    rows = [(1, 6), (2, 7), (3, 10), (4, 3)]  # budget 8: doc 2,3 straddle
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, budget=8)
    pieces = pack_pieces(packed, budget=8).collect()
    by_doc = {}
    by_seq = {}
    for r in pieces:
        by_doc.setdefault(r["doc_id"], 0)
        by_doc[r["doc_id"]] += r["piece_len"]
        by_seq.setdefault(r["seq_id"], 0)
        by_seq[r["seq_id"]] += r["piece_len"]
        assert 0 <= r["piece_offset"] < 8
        assert r["piece_offset"] + r["piece_len"] <= 8
    assert by_doc == dict(rows)                      # conservation
    total = sum(n for _, n in rows)                   # 26 -> seqs 0,1,2 full, 3 partial
    full, last = divmod(total, 8)
    assert all(by_seq[s] == 8 for s in range(full))
    assert by_seq.get(full, 0) == last
    # doc 2 starts at offset 6 of seq 0 -> pieces (2, 5)
    d2 = sorted((r["seq_id"], r["piece_offset"], r["piece_len"]) for r in pieces if r["doc_id"] == 2)
    assert d2 == [(0, 6, 2), (1, 0, 5)]


def test_minhash_recall_report_detects_band_truncation(spark):
    """With enough bands recall is 1.0 on planted near-dups; the report's
    precision term is 1.0 by construction (the verify step filters to the
    same threshold as the exact baseline)."""
    from dataquality_ml_spark.operators import dedup as dd
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(0, base), (1, base + " extra"), (2, "completely different words here now ok")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    mh = dd.minhash_dedup_pairs(df, k=3, num_perms=16, bands=8, rows=2, threshold=0.5)
    ex = dd.ngram_jaccard_pairs(df, k=3, threshold=0.5)
    mh_pairs = {(r["id_a"], r["id_b"]) for r in mh.collect()}
    ex_pairs = {(r["id_a"], r["id_b"]) for r in ex.collect()}
    assert (0, 1) in ex_pairs
    assert mh_pairs <= ex_pairs  # verify step enforces the exact threshold
    assert (0, 1) in mh_pairs    # near-identical docs survive banding


# ---------------------------------------------------------------------------
# Unicode normalization through the dedup family (VERDICT r4 item 1)
# ---------------------------------------------------------------------------
_NFC_TEXT = "café crème café crème one two three four five"
_NFD_TEXT = (
    "café crème café crème one two three four five"
)


def test_unicode_normalize_forms_and_nulls(spark):
    from dataquality_ml_spark.functions.scalar import unicode_normalize

    df = spark.createDataFrame(
        [(1, "café"), (2, "café"), (3, None), (4, "ascii only")],
        "id bigint, text string",
    )
    out = {
        r["id"]: (r["nfc"], r["nfd"])
        for r in df.select(
            "id",
            unicode_normalize("text", "NFC").alias("nfc"),
            unicode_normalize("text", "NFD").alias("nfd"),
        ).collect()
    }
    assert out[1][0] == "café" and out[2][0] == "café"
    assert out[1][1] == "café" and out[2][1] == "café"
    assert out[3] == (None, None)
    assert out[4] == ("ascii only", "ascii only")


def test_dedup_exact_merges_nfc_nfd_variants(spark):
    """NFD and NFC encodings of identical text must land in ONE fingerprint
    group (the under-merge VERDICT r4 flagged)."""
    from dataquality_ml_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [(1, _NFC_TEXT), (2, _NFD_TEXT), (3, "another doc entirely")],
        "doc_id bigint, text string",
    )
    rows = dedup_exact(df).collect()
    assert len(rows) == 2
    merged = [r for r in rows if r["n_copies"] == 2]
    assert len(merged) == 1 and merged[0]["keep_id"] == 1


def test_span_dedup_merges_nfc_nfd_variants(spark):
    """Span hashes over NFD vs NFC text must collide: chunking normalizes
    (tokens are NFC'd), so doc 2's spans are exact duplicates of doc 1's
    and keep_first drops them all."""
    from dataquality_ml_spark.operators.dedup import dedup_spans
    from dataquality_ml_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, _NFC_TEXT), (2, _NFD_TEXT)], "doc_id bigint, text string"
    )
    chunks = chunk_documents(df, chunk=5, overlap=0)
    out = {
        (r["doc_id"], r["chunk_idx"]): r["kept"]
        for r in dedup_spans(chunks).collect()
    }
    doc1_kept = [v for (d, _), v in out.items() if d == 1]
    doc2_kept = [v for (d, _), v in out.items() if d == 2]
    assert all(doc1_kept) and doc2_kept and not any(doc2_kept)


def test_minhash_merges_nfc_nfd_variants(spark):
    """MinHash shingles hash the normalized bytes: the NFD twin must be
    reported as a near-dup pair of the NFC original with Jaccard 1.0."""
    from dataquality_ml_spark.operators.dedup import minhash_dedup_pairs

    df = spark.createDataFrame(
        [
            (1, _NFC_TEXT),
            (2, _NFD_TEXT),
            (3, "totally different words here six seven eight nine ten"),
        ],
        "doc_id bigint, text string",
    )
    pairs = minhash_dedup_pairs(df, k=3, num_perms=16, bands=4, rows=4, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] == 1.0


def test_host_curation_report_caps_and_blocks(spark):
    """Per-host cap + blocklist semantics: capped hosts keep exactly cap
    docs, under-full hosts keep all, blocked hosts keep zero."""
    from dataquality_ml_spark.operators.web import host_curation_report

    rows = (
        [(i, f"https://big.example.com/p/{i}", "w " * 10) for i in range(20)]
        + [(100 + i, f"https://small.example.com/p/{i}", "w w") for i in range(3)]
        + [(200 + i, f"https://bad.example.com/p/{i}", "spam") for i in range(8)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    out = {
        r["host"]: r
        for r in host_curation_report(
            df, blocklist=["bad.example.com"], cap=5
        ).collect()
    }
    assert out["big.example.com"]["n_docs"] == 20
    assert out["big.example.com"]["n_kept"] == 5
    assert out["small.example.com"]["n_kept"] == 3
    assert out["bad.example.com"]["blocked"] == 1
    assert out["bad.example.com"]["n_kept"] == 0
    assert out["small.example.com"]["avg_tokens"] == 2.0


def test_simhash_60bit_reduces_band_aliasing(spark):
    """bits=60 (15-bit bands at k=3) must find the same PLANTED near-dup
    as bits=32 while using the 60-bit portable hash; genuinely unrelated
    docs stay unmatched at either width."""
    from dataquality_ml_spark.operators.dedup import simhash_hamming_pairs

    # long doc: one extra token perturbs few fingerprint bits
    base = " ".join(f"tok{i % 25}" for i in range(120))
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),  # near-dup of 1
            (3, " ".join(f"other{i}" for i in range(60))),
        ],
        "doc_id bigint, text string",
    )
    for bits in (32, 60):
        pairs = {(r["id_a"], r["id_b"]) for r in
                 simhash_hamming_pairs(df, k=3, bits=bits).collect()}
        assert (1, 2) in pairs, bits
        assert not any(3 in p for p in pairs), (bits, pairs)


def test_fold_accents_diacritic_variants(spark):
    from dataquality_ml_spark.functions.scalar import fold_accents
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "Café"), (2, "niño"), (3, "über"), (4, None), (5, "plain")],
        "id bigint, text string",
    )
    out = {r["id"]: r["f"] for r in df.select("id", fold_accents("text").alias("f")).collect()}
    assert out[1] == "Cafe" and out[2] == "nino" and out[3] == "uber"
    assert out[4] is None and out[5] == "plain"


def test_trim_boilerplate_lines_semantics(spark):
    """Line filters: short lines and punct-heavy lines drop by heuristic,
    corpus-repeated lines drop by the hot-line set, survivors reassemble
    in original order."""
    from dataquality_ml_spark.operators.text import trim_boilerplate_lines

    boiler = "subscribe to our newsletter today"
    rows = [
        (i, f"real content line number {i} alpha beta\n{boiler}\nok?\n!!!???!!!###")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in trim_boilerplate_lines(df, max_line_docs=5).collect()}
    for i in range(10):
        r = out[i]
        assert r["n_lines"] == 4
        # boilerplate (10 docs > 5), 'ok?' (short), '!!!...' (punct) drop
        assert r["n_kept"] == 1
        assert r["text"] == f"real content line number {i} alpha beta"

    # without the corpus check the boilerplate line survives
    out2 = {r["doc_id"]: r for r in trim_boilerplate_lines(df).collect()}
    assert out2[0]["n_kept"] == 2 and boiler in out2[0]["text"]


def test_simhash_duplicate_saturated_corpus_and_cap(spark):
    """Duplicate-saturated corpus (VERDICT r6 item 2): one fingerprint
    class holds most of the corpus.  The join-shaped intra-class
    expansion must emit every N²/2 pair exactly once without a
    collect_set of the whole class, and ``max_bucket`` must now bound the
    intra-class side too — a class larger than the cap is skipped, the
    same guard the band buckets get."""
    from itertools import combinations

    from dataquality_ml_spark.operators.dedup import simhash_hamming_pairs

    dup = "boilerplate header identical on every page of this site"
    texts = [dup] * 12 + [
        "one genuinely unique document about adaptive query execution",
        "another unique document on broadcast joins and skew salting",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )

    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_hamming_pairs(df, k=3).collect()
        if r["hamming"] == 0
    }
    want = set(combinations(range(12), 2))
    assert got >= want  # every intra-class pair, exactly once (set ==)
    n_intra = sum(
        1 for r in simhash_hamming_pairs(df, k=3).collect() if r["hamming"] == 0
    )
    assert n_intra >= len(want)  # no pair lost

    # cap below the class size: the 12-member class is skipped entirely,
    # so no Hamming-0 pair among the duplicate ids survives
    capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_hamming_pairs(df, k=3, max_bucket=8).collect()
    }
    assert not (capped & want)


def test_canonical_url_and_unparsed_host_bucket(spark):
    """canonical_url collapses scheme-case/www/tracking/trailing-slash
    variants, leaves unparsable strings distinct; with_host routes
    host-less rows to the explicit UNPARSED_HOST bucket so the quota
    sampler's inner join can no longer silently drop them (ADVICE r5)."""
    from dataquality_ml_spark.operators.web import (
        UNPARSED_HOST,
        canonical_url,
        host_curation_report,
        with_host,
    )

    variants = [
        "https://site.example.org/page/7",
        "HTTP://WWW.SITE.EXAMPLE.ORG/page/7",
        "https://site.example.org/page/7/?utm_source=feed&utm_campaign=x",
        "https://site.example.org/page/7?gclid=abc&fbclid=z#frag",
        "https://site.example.org/page/7?utm_a=1&keep=2&utm_b=3",
        "not a url at all",
        "also notaurl",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(variants)], "doc_id bigint, url string"
    )
    got = {r["doc_id"]: r["c"] for r in
           df.select("doc_id", canonical_url(F.col("url")).alias("c")).collect()}
    canon = "https://site.example.org/page/7"
    assert got[0] == got[1] == got[2] == got[3] == canon
    assert got[4] == canon + "?keep=2"  # non-tracking param survives
    assert got[5] == "not a url at all" and got[6] == "also notaurl"

    # ADVICE r7: structural rules are anchored to the OUTER url — a URL
    # carried as a query-parameter value keeps its www. and trailing
    # slash; bare ?ref= is functional (not tracking) and survives
    extra = [
        (100, "https://a.example.com/login?next=https://www.x.com/"),
        (101, "https://forge.example.com/repo/blob?ref=main"),
        (102, "https://forge.example.com/repo/blob?ref=dev"),
    ]
    df3 = spark.createDataFrame(extra, "doc_id bigint, url string")
    got3 = {r["doc_id"]: r["c"] for r in
            df3.select("doc_id", canonical_url(F.col("url")).alias("c")).collect()}
    assert got3[100] == "https://a.example.com/login?next=https://www.x.com/"
    assert got3[101] == "https://forge.example.com/repo/blob?ref=main"
    assert got3[101] != got3[102]  # different branches stay distinct
    # ...but a caller who KNOWS ref is decorative can opt in
    got_opt = {r["doc_id"]: r["c"] for r in
               df3.select("doc_id", canonical_url(F.col("url"),
                          extra_params="ref").alias("c")).collect()}
    assert got_opt[101] == got_opt[102] == "https://forge.example.com/repo/blob"

    hosts = {r["doc_id"]: r["host"] for r in with_host(df).collect()}
    assert hosts[0] == "site.example.org"
    assert hosts[5] == UNPARSED_HOST and hosts[6] == UNPARSED_HOST

    # unparsed bucket is cappable + blockable like any host
    df2 = df.withColumn("text", F.lit("some words here"))
    rep = {r["host"]: r for r in
           host_curation_report(df2, cap=1, blocklist=[UNPARSED_HOST]).collect()}
    assert rep[UNPARSED_HOST]["n_docs"] == 2
    assert rep[UNPARSED_HOST]["blocked"] == 1
    assert rep[UNPARSED_HOST]["n_kept"] == 0


def test_dedup_clusters_keep_best(spark):
    """keep="best" survivor policy: highest quality wins, ties break to
    the lowest id, members missing from the quality relation rank last,
    and keep="min_id" behavior is unchanged."""
    from dataquality_ml_spark.operators.graph import dedup_clusters

    # two components: {1,2,3} (chain) and {10, 11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    # node 3 has the best score; node 11 missing → 10 wins despite lower
    # score than nothing; tie between 1 and 2 is irrelevant (3 wins)
    quality = spark.createDataFrame(
        [(1, 0.5), (2, 0.5), (3, 0.9), (10, -4.0)],
        "doc_id bigint, score double",
    )
    out = {r["doc_id"]: r for r in
           dedup_clusters(pairs, keep="best", quality=quality).collect()}
    assert {out[n]["keep_id"] for n in (1, 2, 3)} == {3}
    assert out[1]["cluster_size"] == 3
    assert {out[n]["keep_id"] for n in (10, 11)} == {10}

    # exact tie across the whole component → lowest id survives
    q_tied = spark.createDataFrame(
        [(n, 1.0) for n in (1, 2, 3, 10, 11)], "doc_id bigint, score double"
    )
    tied = {r["doc_id"]: r["keep_id"] for r in
            dedup_clusters(pairs, keep="best", quality=q_tied).collect()}
    assert tied[3] == 1 and tied[11] == 10

    # min_id default unchanged
    mn = {r["doc_id"]: r["keep_id"] for r in dedup_clusters(pairs).collect()}
    assert mn == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_pack_doc_boundary_greedy_and_oversize(spark):
    """pack_doc_boundary: no doc straddles the budget, greedy next-fit
    matches a sequential reference replay (including oversize docs taking
    ceil(n/budget) sequences of their own), and the fill report accounts
    every token exactly once."""
    from dataquality_ml_spark.operators.packing import (
        pack_doc_boundary,
        packing_fill_report,
    )

    budget, block = 10, 4
    ns = [3, 4, 2, 6, 5, 25, 1, 9, 2, 8, 7]  # includes an oversize (25)
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(ns)], "doc_id bigint, n_tokens bigint"
    )
    got = {r["doc_id"]: r["seq_id"] for r in
           pack_doc_boundary(df, budget, block=block).collect()}

    # sequential reference: same blockwise greedy
    want, seq_base = {}, 0
    for b in range(0, len(ns), block):
        seq, fill = 0, 0
        for i in range(b, min(b + block, len(ns))):
            n = ns[i]
            if n >= budget:
                asn = seq + 1 if fill > 0 else seq
                want[i] = seq_base + asn
                seq, fill = asn + -(-n // budget), 0
            elif fill + n > budget:
                seq += 1
                want[i], fill = seq_base + seq, n
            else:
                want[i] = seq_base + seq
                fill += n
        seq_base += seq + (1 if fill > 0 else 0)
    assert got == want

    rep = packing_fill_report(
        pack_doc_boundary(df, budget, block=block), budget
    ).collect()
    assert sum(r["used_tokens"] for r in rep) == sum(ns)
    # no-straddle: every non-oversize sequence fits within budget
    for r in rep:
        docs_in_seq = [ns[i] for i, s in got.items() if s == r["seq_id"]]
        if all(n < budget for n in docs_in_seq):
            assert r["used_tokens"] <= budget


def test_canonical_url_idempotent_fuzz(spark):
    """canonical_url is idempotent: canonical(canonical(u)) ==
    canonical(u) over a 400-URL adversarial fuzz corpus (mixed schemes,
    case, www, stacked tracking params, separator debris, fragments,
    unicode, garbage).  Idempotence is the property the separator-cleanup
    regex chain could silently lose."""
    import random

    rng = random.Random(7)
    schemes = ["https://", "http://", "HTTP://", "ftp://", ""]
    hosts = ["www.Site.ORG", "site.org", "WWW.EXAMPLE.com", "a.b.c.de", "xn--bcher-kva.ch"]
    paths = ["", "/", "/p", "/p/", "/P/Q", "/p//q/", "/p%20x"]
    params = ["utm_source=a", "utm_campaign=b%20c", "gclid=1", "fbclid=2",
              "ref=x", "x=1", "keep=2", "a=b=c", "empty=", "flag"]
    frags = ["", "#f", "#a?b&c"]
    urls = []
    for _ in range(400):
        ps = "&".join(rng.sample(params, rng.randint(0, 4)))
        sep = rng.choice(["?", "?&", "??", ""]) if ps else rng.choice(["", "?", "?&"])
        urls.append(
            rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
            + sep + ps + rng.choice(frags)
        )
    urls += ["", "   ", "not a url", "héllo wörld", "https://", "?x=1", "#only"]

    from dataquality_ml_spark.operators.web import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonical_url(F.col("url"))
    bad = (
        df.select("url", once.alias("c1"), canonical_url(once).alias("c2"))
        .where(~(F.col("c1").eqNullSafe(F.col("c2"))))
        .collect()
    )
    assert not bad, f"non-idempotent canonicalization: {bad[:5]}"


def test_rrf_fuse_math_and_disjoint_lists(spark):
    from dataquality_ml_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, neighbor_id long, rank int",
    )
    out = {r["neighbor_id"]: r for r in rrf_fuse(a, b, topk=10).collect()}
    # 11 appears in both lists: 1/62 + 1/61
    assert out[11]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert out[11]["fused_rank"] == 1
    # single-system candidates contribute only their own term
    assert out[10]["rrf_score"] == round(1 / 61, 6)
    assert out[13]["rrf_score"] == round(1 / 62, 6)
    assert out[12]["rrf_score"] == round(1 / 63, 6)
    assert out[10]["rank_b"] is None and out[13]["rank_a"] is None
    # tie-break: 10 (1/61) beats nothing equal; 13 (1/62) vs 12 (1/63)
    order = sorted(out.values(), key=lambda r: r["fused_rank"])
    assert [r["neighbor_id"] for r in order] == [11, 10, 13, 12]


def test_jaccard_topk_exact_sets(spark):
    from dataquality_ml_spark.operators.text import jaccard_topk

    rows = [
        (0, ["a", "b", "c", "d"]),
        (1, ["a", "b", "c", "x"]),   # J(0,1) = 3/5 = 0.6
        (2, ["a", "b", "y", "z"]),   # J(0,2) = 2/6 ≈ 0.3333
        (3, ["p", "q"]),             # J(0,3) = 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, tset array<string>")
    got = jaccard_topk(df, df.where(F.col("doc_id") == 0), k=2).collect()
    assert [(r["neighbor_id"], r["sim"], r["rank"]) for r in got] == [
        (1, 0.6, 1),
        (2, 0.3333, 2),
    ]


def test_jaccard_topk_empty_sets_score_zero(spark):
    from dataquality_ml_spark.operators.text import jaccard_topk

    rows = [(0, ["a", "b"]), (1, []), (2, ["a"])]
    df = spark.createDataFrame(rows, "doc_id long, tset array<string>")
    # empty query vs empty candidate must NOT rank first on a NaN score
    got = jaccard_topk(df, df.where(F.col("doc_id") == 1), k=3).collect()
    assert all(r["sim"] == 0.0 for r in got)
    got0 = jaccard_topk(df, df.where(F.col("doc_id") == 0), k=3).collect()
    assert [(r["neighbor_id"], r["sim"]) for r in got0] == [(2, 0.5), (1, 0.0)]


def test_rrf_fuse_matches_python_reference_randomized(spark):
    """Seeded randomized differential: fused scores/ranks must equal the
    plain-Python RRF over arbitrary overlapping top-N lists."""
    import random

    from dataquality_ml_spark.operators.similarity import rrf_fuse

    for seed in (3, 11):
        rng = random.Random(seed)
        cands = list(range(100))

        def ranked_list(n):
            picks = rng.sample(cands, n)
            return [(0, c, r + 1) for r, c in enumerate(picks)]

        la, lb = ranked_list(20), ranked_list(20)
        a = spark.createDataFrame(la, "query_id long, neighbor_id long, rank int")
        b = spark.createDataFrame(lb, "query_id long, neighbor_id long, rank int")

        ra = {c: r for _, c, r in la}
        rb = {c: r for _, c, r in lb}
        scores = {
            c: round(
                (1 / (60 + ra[c]) if c in ra else 0.0)
                + (1 / (60 + rb[c]) if c in rb else 0.0),
                6,
            )
            for c in set(ra) | set(rb)
        }
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

        got = rrf_fuse(a, b, topk=10).collect()
        assert [(r["neighbor_id"], r["rrf_score"]) for r in got] == want, seed
        assert [r["fused_rank"] for r in got] == list(range(1, len(got) + 1))


def test_triplet_manifest_semantics(spark):
    """Positive is the nearest SAME-label (not self), negative the
    nearest DIFFERENT-label; margin can be negative when the negative
    sits closer."""
    from dataquality_ml_spark.operators.similarity import triplet_manifest

    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.9, 0.1], "b"),   # closest overall — wrong label → negative
        (2, [0.5, 0.5], "a"),   # same label → positive
        (3, [0.0, 1.0], "b"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = triplet_manifest(df, df.where(F.col("vec_id") == 0)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["pos_id"], r["neg_id"]) == (2, 1)
    assert r["neg_sim"] > r["pos_sim"]  # hard negative beats the positive
    assert r["margin"] == round(r["pos_sim"] - r["neg_sim"], 4) and r["margin"] < 0


def test_ngram_containment_detects_near_subset(spark):
    """A short doc quoted verbatim inside a much longer wrapper: Jaccard
    stays low (union diluted by the wrapper's extra mass) but containment
    of the short doc approaches 1 — the directional signal the symmetric
    metric misses. Unrelated docs produce no pair."""
    from dataquality_ml_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(12))
    wrapper = (
        " ".join(f"pre{i}" for i in range(30))
        + " " + quote + " "
        + " ".join(f"post{i}" for i in range(30))
    )
    df = spark.createDataFrame(
        [(1, quote), (2, wrapper), (3, " ".join(f"z{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    rows = ngram_containment_pairs(df, k=5, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    r = rows[0]
    assert r["containment_a"] == 1.0  # every 5-shingle of the quote is in the wrapper
    assert r["containment_b"] < 0.2 and r["jaccard"] < 0.2
    # the symmetric operator misses this pair at the same bar
    assert ngram_jaccard_pairs(df, k=5, threshold=0.9).count() == 0


def test_ngram_pairs_hot_shingle_contract(spark):
    """Round 11 (VERDICT r10 item 2): with max_df=None the uncapped
    shingle self-join goes quadratic on boilerplate — the default must
    FAIL LOUDLY past hot_df, 'exact' must opt in, max_df= must cap, and
    a bad knob value must raise at plan time (fit_features convention)."""
    import pytest

    from dataquality_ml_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    boiler = " ".join(f"b{i}" for i in range(6))  # shared 5-shingles
    df = spark.createDataFrame(
        [(i, f"u{i} v{i} w{i} x{i} y{i} {boiler}") for i in range(40)],
        "doc_id long, text string",
    )
    # every doc shares the boilerplate shingles → df=40 > hot_df=8
    with pytest.raises(ValueError, match="hottest shingle appears in 40"):
        ngram_jaccard_pairs(df, k=5, threshold=0.1, hot_df=8).collect()
    with pytest.raises(ValueError, match="max_df"):
        ngram_containment_pairs(df, k=5, threshold=0.9, hot_df=8).collect()
    # explicit opt-in accepts the quadratic cost and stays exact
    n_exact = ngram_jaccard_pairs(
        df, k=5, threshold=0.1, hot_df=8, on_hot_shingle="exact"
    ).count()
    assert n_exact == 40 * 39 // 2  # all pairs share the boilerplate
    # stop-shingle cap removes the hot shingles (loudness not needed)
    assert (
        ngram_jaccard_pairs(df, k=5, threshold=0.1, max_df=8, hot_df=8).count()
        == 0
    )
    with pytest.raises(ValueError, match="on_hot_shingle"):
        ngram_jaccard_pairs(df, on_hot_shingle="warn")
    # default threshold untripped: a cool corpus runs unchanged
    cool = spark.createDataFrame(
        [(i, f"a{i} b{i} c{i} d{i} e{i} f{i}") for i in range(10)],
        "doc_id long, text string",
    )
    assert ngram_jaccard_pairs(cool, k=5, threshold=0.9).count() == 0
