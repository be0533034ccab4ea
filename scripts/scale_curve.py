"""Scale-curve harness (VERDICT r4 item 5): run the dedup / tokenizer /
ANN headliners at 1x and 10x corpus size using the zero-storage synthetic
sources, and report the empirical scaling exponent per operator
(t ~ n^alpha => alpha = log10(t_10x / t_1x)).

Near-linear (alpha ~ 1) is the expectation for the banded/bucketed
designs; anything clearly superlinear is a finding.  Run:

    python scripts/scale_curve.py [base_docs] [factor]

Prints a markdown table (paste into NOTES_r5.md) plus one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _synthetic_docs(spark, n_docs: int):
    from dataquality_ml_spark.sources.synthetic import SyntheticDocsDataSource

    try:
        spark.dataSource.register(SyntheticDocsDataSource)
    except Exception:
        pass  # already registered in this session
    return (
        spark.read.format("synthetic_docs")
        .option("n_docs", n_docs)
        .option("n_partitions", 32)
        .load()
    )


def _synthetic_embeddings(spark, n_vecs: int, dim: int = 16):
    from pyspark.sql import functions as F

    # deterministic pseudo-random unit-ish vectors, pure codegen
    comps = [
        (
            F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(2000)).cast("double")
            / 1000.0
            - 1.0
        )
        for d in range(dim)
    ]
    return spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def _ops():
    from pyspark.sql import functions as F

    from dataquality_ml_spark.operators import dedup as dd
    from dataquality_ml_spark.operators import similarity as sim
    from dataquality_ml_spark.operators import unigram as ug
    from dataquality_ml_spark.operators.bpe import bpe_segment, bpe_train
    from dataquality_ml_spark.operators.packing import pack_sequences
    from dataquality_ml_spark.operators.text import chunk_documents, token_stats

    def span_dedup(docs):
        chunks = chunk_documents(docs, chunk=3, overlap=0)
        return dd.dedup_spans(chunks).count()

    def bpe(docs):
        merges = bpe_train(docs, num_merges=6)
        return bpe_segment(docs, merges).count()

    def unigram_em(docs):
        wc = ug.word_counts(docs).localCheckpoint(eager=True)
        srows = ug.seed_pieces(wc, 4, 24).collect()
        tot = sum(r["freq"] for r in srows)
        pdf = wc.sparkSession.createDataFrame(
            [(r["piece"], r["freq"] / tot) for r in srows],
            "piece string, prob double",
        )
        return ug.em_expected_counts(wc, pdf, 4).count()

    def pack(docs):
        n_df = token_stats(docs).select("doc_id", "n_tokens")
        return pack_sequences(n_df, budget=256).count()

    def ivf_pq(emb):
        cents = sim.kmeans_fit(emb, k=8, iters=1)
        books = sim.pq_train(emb, m=4, k=8, iters=1)
        codes = sim.pq_encode(emb, books).join(
            sim.kmeans_assign(emb, cents), "vec_id"
        )
        q = emb.where(F.col("vec_id") < 8)
        return sim.ivf_pq_search_codes(codes, q, cents, books, topk=5).count()

    return {
        "dedup_exact": ("docs", lambda d: dd.dedup_exact(d).count()),
        "minhash_dedup_pairs": (
            "docs",
            lambda d: dd.minhash_dedup_pairs(
                d, k=3, num_perms=16, bands=4, rows=4, threshold=0.8
            ).count(),
        ),
        "simhash_hamming_pairs": (
            "docs",
            lambda d: dd.simhash_hamming_pairs(d, k=3).count(),
        ),
        "simhash_hamming_60bit": (
            "docs",
            lambda d: dd.simhash_hamming_pairs(d, k=3, bits=60).count(),
        ),
        "span_dedup": ("docs", span_dedup),
        "winnow_fingerprints": (
            "docs",
            lambda d: dd.winnow_fingerprints(d).count(),
        ),
        "bpe_train_segment": ("docs", bpe),
        "unigram_seed_em1": ("docs", unigram_em),
        "pack_sequences": ("docs", pack),
        "ivf_pq_encode_search": ("emb", ivf_pq),
    }


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # optional op filter (comma list): pair-ENUMERATION operators are
    # output-bound on the synthetic corpus (a 30-word vocabulary makes
    # most documents near-dups of each other, so the pair listing itself
    # grows ~n^2) — at large factors run the linear-by-design set and
    # measure the pair families through their capped/production knobs.
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    from dataquality_ml_spark import get_spark

    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("OFF")

    results: dict[str, dict] = {}
    for scale in (1, factor):
        n_docs = base * scale
        docs = _synthetic_docs(spark, n_docs).localCheckpoint()
        emb = _synthetic_embeddings(spark, n_docs).localCheckpoint()
        inputs = {"docs": docs, "emb": emb}
        # untimed warmup: JVM/codegen/python-worker spin-up must not be
        # billed to whichever operator happens to run first
        from dataquality_ml_spark.operators import dedup as _dd

        _dd.dedup_exact(docs).count()
        for name, (kind, fn) in _ops().items():
            if only is not None and name not in only:
                continue
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = fn(inputs[kind])
            sec = round(time.perf_counter() - t0, 3)
            results.setdefault(name, {})[scale] = {"sec": sec, "rows": out}

    print(f"\n| operator | t({base}) s | t({base * factor}) s | alpha |")
    print("|---|---|---|---|")
    table = {}
    for name, r in results.items():
        t1, t2 = r[1]["sec"], r[factor]["sec"]
        alpha = round(math.log(t2 / t1) / math.log(factor), 2) if t1 > 0 else None
        table[name] = {"t1": t1, "t2": t2, "alpha": alpha}
        print(f"| {name} | {t1} | {t2} | {alpha} |")
    print()
    print(json.dumps({"base": base, "factor": factor, "ops": table}))
    spark.stop()


if __name__ == "__main__":
    main()
