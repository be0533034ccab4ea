"""Unigram-LM (SentencePiece-style) tokenizer training — Kudo 2018,
"Subword Regularization: Improving Neural Network Translation Models with
Multiple Subword Candidates".

The production counterpart to ``operators/bpe.py``: instead of greedy
merges, fit a unigram language model over a candidate piece vocabulary by
EM and keep the most probable pieces.  Same scale shape as BPE training:

- the ONLY corpus-scale work is one map-side-combined word count
  (Heaps' law bounds the distinct-word relation);
- the seed vocabulary is a substring explosion of the WORD table —
  bounded by |words| · max_word_len · max_piece_len, never corpus-sized;
- every EM iteration runs forward-backward expected counts over the word
  relation as ITERATIVE RELATIONAL DP — position-step joins against the
  broadcast piece table, pure DataFrame ops, no UDF — so a single E-step
  is directly expressible as unrolled SQL CTEs and therefore
  DuckDB-oracle-checkable (the same unroll the BPE oracle uses for
  merges);
- Viterbi segmentation is the same DP with (max, argmax) in place of
  (sum), applied to the word relation and broadcast-joined back to the
  corpus — the corpus is never segmented row-by-row.

Deviation from Kudo 2018, documented: pruning keeps the highest-
probability pieces (single characters are never pruned) instead of the
likelihood-loss criterion; with the tie-break (prob desc, piece asc) the
trainer is deterministic and engine-portable.  The pure-Python reference
trainer in tests replays the exact same algorithm for the differential
check (mirroring ``test_bpe``'s randomized differential).
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataquality_ml_spark.functions.scalar import tokens

#: Hard cap on the DP lattice depth (one bounded join per character
#: position).  Without it, ``max_word_len=None`` defaulted to the corpus
#: max word length, so a single pathological token (base64 blob, glued
#: URL, unsegmented CJK run) turned the driver-side plan loop into
#: thousands of join steps — a plan explosion, not an executor problem.
#: Words longer than the cap are excluded from the DP relation and fall
#: back to UNK downstream (``unigram_tokenize``'s existing contract),
#: mirroring ``max_piece_len``'s bound on the substring explosion and the
#: unrolled-CTE oracles, whose fixed unroll depth drops over-length words
#: at the final-position join the same way.
DEFAULT_MAX_WORD_LEN = 32


def _effective_max_word_len(words: DataFrame, max_word_len: int | None) -> int:
    """min(corpus max word length, requested-or-default cap) — the DP
    never runs more steps than the data needs, and never more than the
    cap regardless of adversarial input."""
    corpus_max = int(words.agg(F.max(F.length("word"))).first()[0] or 0)
    cap = DEFAULT_MAX_WORD_LEN if max_word_len is None else max_word_len
    return min(corpus_max, cap)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — the one corpus-scale pass."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _substrings(word_col, max_piece_len: int):
    """All substrings of length 1..max_piece_len (with multiplicity)."""
    n = F.length(word_col)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda s: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_piece_len), n - s + 1)),
                lambda l: word_col.substr(s, l),
            ),
        )
    )


def seed_pieces(
    words: DataFrame, max_piece_len: int = 4, max_pieces: int = 60
) -> DataFrame:
    """Candidate piece vocabulary: every single character (never pruned —
    they guarantee every word stays segmentable) plus the ``max_pieces``
    most frequent multi-character substrings, frequency = occurrence count
    weighted by word frequency.  Tie-break (freq desc, piece asc).
    Output: (piece, freq) — a bounded relation."""
    occ = words.select(
        F.explode(_substrings(F.col("word"), max_piece_len)).alias("piece"),
        F.col("cnt"),
    ).groupBy("piece").agg(F.sum("cnt").alias("freq"))
    chars = occ.where(F.length("piece") == 1)
    multi = (
        occ.where(F.length("piece") >= 2)
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.desc("freq"), F.asc("piece"))
            ),
        )
        .where(F.col("_rk") <= max_pieces)
        .drop("_rk")
    )
    return chars.unionByName(multi)


def _occurrences(
    words: DataFrame, probs: DataFrame, max_piece_len: int
) -> DataFrame:
    """(word, cnt, wl, s, e, piece, prob): every in-vocab substring
    occurrence, s/e = 0-based boundary positions (piece spans s..e).
    The join against ``probs`` is broadcast — the piece table is model
    parameters."""
    n = F.length("word")
    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda s: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_piece_len), n - s + 1)),
                lambda l: F.struct(
                    (s - 1).alias("s"),
                    (s - 1 + l).alias("e"),
                    F.col("word").substr(s, l).alias("piece"),
                ),
            ),
        )
    )
    ex = words.select(
        "word", "cnt", n.alias("wl"), F.explode(spans).alias("sp")
    ).select("word", "cnt", "wl", "sp.s", "sp.e", "sp.piece")
    return ex.join(F.broadcast(probs.select("piece", "prob")), "piece")


def _em_expected_counts_array(
    words: DataFrame, plist: list[tuple[str, float]], max_piece_len: int
) -> DataFrame:
    """Single-pass array-DP E-step body (see ``em_expected_counts``):
    per-word forward/backward vectors as array columns built by nested
    higher-order ``aggregate``; the piece table rides as a map literal.
    ``plist`` is the collected (piece, prob) model, sorted for a
    deterministic literal."""
    spark = words.sparkSession
    if not plist:
        return spark.createDataFrame([], "piece string, ecnt double")
    m = F.map_from_arrays(
        F.lit([p for p, _ in plist]), F.lit([v for _, v in plist])
    )
    mpl = max_piece_len
    wl = F.length("word")
    # alpha as a 1-based array: a[k] = alpha(position k-1); alpha(0)=1,
    # alpha(i) = sum_l alpha(i-l)·p(word[i-l+1..i]), l ascending — the
    # same incoming-edge terms the relational groupBy sums per position
    alpha = F.aggregate(
        F.sequence(F.lit(1), wl),
        F.array(F.lit(1.0)),
        lambda acc, i: F.concat(
            acc,
            F.array(
                F.aggregate(
                    F.sequence(F.lit(1), F.least(F.lit(mpl), i)),
                    F.lit(0.0),
                    lambda s, l: s
                    + F.coalesce(
                        F.element_at(acc, i - l + 1)
                        * F.element_at(m, F.col("word").substr(i - l + 1, l)),
                        F.lit(0.0),
                    ),
                )
            ),
        ),
    )
    # beta stored REVERSED: rb[k+1] = beta(wl-k); beta(wl)=1,
    # beta(j) = sum_l p(word[j+1..j+l])·beta(j+l) = rb entries k-l+1
    rbeta = F.aggregate(
        F.sequence(F.lit(1), wl),
        F.array(F.lit(1.0)),
        lambda acc, k: F.concat(
            acc,
            F.array(
                F.aggregate(
                    F.sequence(F.lit(1), F.least(F.lit(mpl), k)),
                    F.lit(0.0),
                    lambda s, l: s
                    + F.coalesce(
                        F.element_at(m, F.col("word").substr(wl - k + 1, l))
                        * F.element_at(acc, k - l + 1),
                        F.lit(0.0),
                    ),
                )
            ),
        ),
    )
    base = (
        words.where(wl > 0)
        .select("word", "cnt", wl.alias("_wl"), alpha.alias("_a"), rbeta.alias("_rb"))
        .withColumn("_z", F.element_at(F.col("_a"), F.col("_wl") + 1))
        .where(F.col("_z") > 0)
    )
    # every occurrence (start s 1-based, length l): contribution
    # cnt·alpha[s-1]·p·beta[s-1+l], divided by Z — the exact relational
    # term order (cnt * a * p * b / z)
    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.col("_wl")),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(mpl), F.col("_wl") - s + 1)
                ),
                lambda l: F.struct(
                    F.col("word").substr(s, l).alias("piece"),
                    (
                        F.col("cnt")
                        * F.element_at(F.col("_a"), s)
                        * F.element_at(m, F.col("word").substr(s, l))
                        * F.element_at(
                            F.col("_rb"), F.col("_wl") - (s - 1 + l) + 1
                        )
                        / F.col("_z")
                    ).alias("contrib"),
                ),
            ),
        )
    )
    return (
        base.select(F.explode(spans).alias("sp"))
        .where(F.col("sp.contrib").isNotNull() & (F.col("sp.contrib") > 0))
        .groupBy(F.col("sp.piece").alias("piece"))
        .agg(F.sum("sp.contrib").alias("ecnt"))
    )


def em_expected_counts(
    words: DataFrame,
    probs: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int | None = None,
    strategy: str = "auto",
    local_pieces_limit: int = 4096,
) -> DataFrame:
    """One E-step: expected piece counts under the current unigram LM via
    forward-backward over each word's segmentation lattice.
    Output: (piece, ecnt).

    Two strategies (round 13, guide §1.2 — the per-position join loop was
    the whole cost of the E-step at bench scale: 65 sequential Spark jobs
    for a 12-step lattice):

    - ``'array'`` (default via ``'auto'`` when the piece table fits
      ``local_pieces_limit``): the piece table is MODEL PARAMETERS — it
      is collected once and inlined as a map literal, and the entire
      forward-backward DP runs per word inside ONE codegen'd projection
      (nested higher-order ``aggregate`` over the ≤max_word_len
      positions, each summing its ≤max_piece_len incoming lattice edges
      in deterministic short-to-long order).  One scan of the
      Heaps-bounded word relation, one explode, one groupBy — zero
      joins, zero checkpoints, embarrassingly parallel, and the shape
      that actually survives 100 TB (no 2·L sequential barriers).
    - ``'relational'``: the original position-step joins against the
      broadcast piece table (one bounded join per character position,
      lazily checkpointed every 2 steps).  The fallback when the piece
      table exceeds ``local_pieces_limit`` (a map-literal lookup is a
      linear scan per probe, so very large vocabularies want the
      broadcast hash join), and the form the unrolled-CTE DuckDB oracle
      replays verbatim.

    Both strategies sum the exact same per-occurrence terms
    cnt·α(s)·p·β(e)/Z over the same occurrence set; they can differ only
    in float summation order (the same nondeterminism any shuffled
    aggregation already has).  Microscopic documented edge: a lattice
    position whose α/β underflows to exactly 0.0 keeps its piece row
    (ecnt 0.0) under ``'relational'`` but is filtered under ``'array'``
    — unreachable with any non-degenerate model (probs ~1e-2, words
    ≤32 chars).

    The lattice depth is capped (``DEFAULT_MAX_WORD_LEN``): words longer
    than the cap are filtered out of the DP relation up front — they
    could never reach the final-position normalizer join anyway, so this
    changes no output row, only bounds the plan loop and skips their
    occurrence explosion."""
    if strategy not in ("auto", "array", "relational"):
        raise ValueError("strategy must be auto|array|relational")
    max_word_len = _effective_max_word_len(words, max_word_len)
    words = words.where(F.length("word") <= max_word_len)
    if strategy != "relational":
        # Limit-probe BEFORE collecting (guide §5: never collect an
        # unbounded relation to find out it was too big): fetch at most
        # limit+1 rows, so an over-limit vocabulary costs one bounded
        # job instead of a full driver collect. When the probe returns
        # <= limit rows the limit never truncated, so `head` IS the
        # complete piece table.
        head = probs.select("piece", "prob").limit(local_pieces_limit + 1).collect()
        if len(head) <= local_pieces_limit:
            plist = sorted((r["piece"], float(r["prob"])) for r in head)
            return _em_expected_counts_array(
                words, plist, max_piece_len
            )
        if strategy == "array":
            raise ValueError(
                "em_expected_counts: piece table exceeds "
                f"local_pieces_limit={local_pieces_limit} — use "
                "strategy='relational' (or raise the limit)"
            )
    occ = _occurrences(words, probs, max_piece_len).localCheckpoint(eager=False)

    # forward: alpha(0) = 1; alpha(i) = sum_j alpha(j) * p(word[j..i]).
    # Every step is lazily localCheckpointed: without the barrier, step i's
    # plan embeds the JOIN DAGS of all prior steps (quadratic lineage —
    # measured 20s+ at sf0.01); with it each step is one bounded join over
    # materialized rows and the whole DP is linear.
    af = words.select("word", F.lit(0).alias("pos"), F.lit(1.0).alias("a"))
    for i in range(1, max_word_len + 1):
        af_step = (
            occ.where(F.col("e") == i)
            .alias("o")
            .join(
                af.alias("p"),
                (F.col("o.word") == F.col("p.word"))
                & (F.col("p.pos") == F.col("o.s")),
            )
            .groupBy(F.col("o.word").alias("word"))
            .agg(F.sum(F.col("p.a") * F.col("o.prob")).alias("a"))
            .select("word", F.lit(i).alias("pos"), "a")
        )
        af = af.unionByName(af_step)
        if i % 2 == 0 or i == max_word_len:
            # barrier every 2nd step: lineage depth stays <= 2 joins
            # (linear total work) at half the scheduling cost
            af = af.localCheckpoint(eager=False)

    # backward: beta(wl) = 1; beta(j) = sum_i p(word[j..i]) * beta(i)
    bt = words.select("word", F.length("word").alias("pos"), F.lit(1.0).alias("b"))
    for k in range(1, max_word_len + 1):
        bt_step = (
            occ.where(F.col("s") == F.col("wl") - k)
            .alias("o")
            .join(
                bt.alias("n"),
                (F.col("o.word") == F.col("n.word"))
                & (F.col("n.pos") == F.col("o.e")),
            )
            .groupBy(F.col("o.word").alias("word"))
            .agg(F.sum(F.col("o.prob") * F.col("n.b")).alias("b"))
            .select("word", (F.length("word") - k).alias("pos"), "b")
        )
        bt = bt.unionByName(bt_step)
        if k % 2 == 0 or k == max_word_len:
            bt = bt.localCheckpoint(eager=False)

    z = (
        af.alias("a")
        .join(
            words.select("word", F.length("word").alias("_wl")),
            ["word"],
        )
        .where(F.col("pos") == F.col("_wl"))
        .select("word", F.col("a").alias("z"))
    )
    # DP frames are Heaps-bounded (|words|·max_word_len rows) — broadcast
    # them so the final expectation pass is a single shuffle-free scan of
    # the occurrence relation; at a scale where the word table outgrows
    # broadcast, drop the hints and AQE plans these as shuffle joins.
    return (
        occ.alias("o")
        .join(F.broadcast(af.alias("fa")), (F.col("o.word") == F.col("fa.word")) & (F.col("fa.pos") == F.col("o.s")))
        .join(F.broadcast(bt.alias("bb")), (F.col("o.word") == F.col("bb.word")) & (F.col("bb.pos") == F.col("o.e")))
        .join(F.broadcast(z.alias("zz")), F.col("o.word") == F.col("zz.word"))
        .where(F.col("zz.z") > 0)
        .groupBy(F.col("o.piece").alias("piece"))
        .agg(
            F.sum(
                F.col("o.cnt") * F.col("fa.a") * F.col("o.prob") * F.col("bb.b")
                / F.col("zz.z")
            ).alias("ecnt")
        )
    )


def viterbi_segment_words(
    words: DataFrame,
    probs: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int | None = None,
) -> DataFrame:
    """Best segmentation per WORD under the unigram LM — (max, argmax) DP
    over the same lattice as ``em_expected_counts``; carries the piece
    count through the recursion so no backpointer walk is needed.

    Path score is the PRODUCT of piece probabilities, not a sum of logs:
    IEEE multiplication is correctly rounded and evaluated in the same
    left-to-right DP order in every engine, so equal-probability ties
    compare EQUAL cross-engine, while ``log`` differs between libm and
    the JVM in the last ulp and would flip tie-breaks.  Words are short
    (lattice depth ≤ max word length), so underflow is not a concern.
    Tie-break on equal path probability: fewer pieces, then earlier
    start — deterministic and engine-portable.
    Output: (word, n_pieces, logp).

    Lattice depth capped like ``em_expected_counts``: over-length words
    are dropped from the DP relation (they get no segmentation row), so
    ``unigram_tokenize``'s UNK fallback covers them — which also keeps
    the probability product clear of underflow (≤ cap factors)."""
    max_word_len = _effective_max_word_len(words, max_word_len)
    words = words.where(F.length("word") <= max_word_len)
    occ = _occurrences(words, probs, max_piece_len).localCheckpoint(eager=False)

    v = words.select(
        "word",
        F.lit(0).alias("pos"),
        F.lit(1.0).alias("vp"),
        F.lit(0).alias("np"),
        F.array().cast("array<string>").alias("path"),
    )
    for i in range(1, max_word_len + 1):
        cand = (
            occ.where(F.col("e") == i)
            .alias("o")
            .join(
                v.alias("p"),
                (F.col("o.word") == F.col("p.word"))
                & (F.col("p.pos") == F.col("o.s")),
            )
            .select(
                F.col("o.word").alias("word"),
                (F.col("p.vp") * F.col("o.prob")).alias("vp"),
                (F.col("p.np") + 1).alias("np"),
                F.col("o.s").alias("s"),
                F.concat(F.col("p.path"), F.array(F.col("o.piece"))).alias("path"),
            )
        )
        best = (
            cand.withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("word").orderBy(
                        F.desc("vp"), F.asc("np"), F.asc("s")
                    )
                ),
            )
            .where(F.col("_rk") == 1)
            .select("word", F.lit(i).alias("pos"), "vp", "np", "path")
        )
        # same every-2nd-step linear-lineage barrier as em_expected_counts
        v = v.unionByName(best)
        if i % 2 == 0 or i == max_word_len:
            v = v.localCheckpoint(eager=False)
    return (
        v.join(words.select("word", F.length("word").alias("_wl")), "word")
        .where(F.col("pos") == F.col("_wl"))
        .select(
            "word",
            F.col("np").alias("n_pieces"),
            F.round(F.log(F.col("vp")), 4).alias("logp"),
            F.col("path").alias("pieces"),
        )
    )


def unigram_build_vocab(pieces: list[tuple[str, float]]) -> dict[str, int]:
    """piece → token id, in (prob desc, piece asc) order — the order
    ``unigram_train`` already returns, so ids are stable and
    engine-portable."""
    return {p: i for i, (p, _) in enumerate(pieces)}


def unigram_tokenize(
    df: DataFrame,
    pieces: list[tuple[str, float]],
    max_piece_len: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = -1,
    max_word_len: int | None = None,
    seg_words: DataFrame | None = None,
) -> DataFrame:
    """Corpus → token-id sequences under a unigram LM: Viterbi-segment the
    WORD relation (the piece path rides through the DP as an array — no
    backpointer walk), broadcast-join paths back to the positionally
    exploded corpus, map pieces to ids through a broadcast vocab relation,
    and reassemble each document in (word, piece) position order with a
    sort-free array_sort(collect_list(struct)).

    Words with no segmentation under the vocabulary (foreign characters)
    emit a single ``unk_id`` token — the same contract as
    ``bpe_tokenize``.  Output: (id, token_ids array<int>, n_ids)."""
    spark = df.sparkSession
    if seg_words is None:
        wc = word_counts(df, text_col)
        seg = viterbi_segment_words(
            wc, spark.createDataFrame(pieces, "piece string, prob double"),
            max_piece_len, max_word_len,
        ).select("word", "pieces")
    else:
        # a word's Viterbi path depends only on (word, probs), never the
        # counts — a segmentation computed over ANY superset word relation
        # under the SAME pieces is reusable verbatim (extra words ride the
        # broadcast join harmlessly); callers pass the memoized corpus seg
        seg = seg_words.select("word", "pieces")
    vocab = unigram_build_vocab(pieces)
    vdf = F.broadcast(
        spark.createDataFrame(list(vocab.items()), "piece string, tid int")
    )
    ex = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("wpos", "word")
    ).where(F.col("word") != "")
    with_path = ex.join(F.broadcast(seg), "word", "left").select(
        id_col,
        "wpos",
        # unsegmentable word → one UNK piece standing for the whole word
        F.coalesce(F.col("pieces"), F.array(F.col("word"))).alias("pieces"),
    )
    sym = with_path.select(
        id_col, "wpos", F.posexplode("pieces").alias("spos", "piece")
    )
    mapped = sym.join(vdf, "piece", "left").select(
        id_col,
        "wpos",
        "spos",
        F.coalesce(F.col("tid"), F.lit(unk_id)).alias("tid"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("wpos", "spos", "tid"))),
        lambda s: s.getField("tid"),
    )
    return mapped.groupBy(id_col).agg(
        ordered.alias("token_ids"), F.count(F.lit(1)).alias("n_ids")
    )


def unigram_segment(
    df: DataFrame,
    seg_words: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus segmentation report: explode corpus words, broadcast-join
    the per-word Viterbi result, aggregate per document.  The corpus never
    enters a DP — only the bounded word relation does.
    Output: (id, n_words, n_pieces, chars_per_piece)."""
    ex = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("word")
    ).where(F.col("word") != "")
    j = ex.join(F.broadcast(seg_words), "word")
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_pieces").alias("n_pieces"),
        F.round(F.sum(F.length("word")) / F.sum("n_pieces"), 4).alias(
            "chars_per_piece"
        ),
    )


# ---------------------------------------------------------------------------
# Pure-Python reference implementations (local strategy + differential tests)
# ---------------------------------------------------------------------------
def _py_em_step(
    words: dict[str, int],
    probs: dict[str, float],
    max_piece_len: int,
    max_word_len: int = DEFAULT_MAX_WORD_LEN,
) -> dict[str, float]:
    """In-memory forward-backward expected counts — the reference
    implementation the relational DP must match.  ``max_word_len`` is
    threaded from the caller (ADVICE r7) so an explicit cap ≠ 32 keeps
    the Python and relational strategies excluding the SAME words."""
    ecnt: dict[str, float] = {}
    for w, c in words.items():
        if len(w) > max_word_len:
            continue  # same cap as the relational DP — over-length → UNK
        n = len(w)
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for i in range(1, n + 1):
            for j in range(max(0, i - max_piece_len), i):
                p = probs.get(w[j:i])
                if p:
                    alpha[i] += alpha[j] * p
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for j in range(n - 1, -1, -1):
            for i in range(j + 1, min(n, j + max_piece_len) + 1):
                p = probs.get(w[j:i])
                if p:
                    beta[j] += p * beta[i]
        z = alpha[n]
        if z <= 0:
            continue
        for j in range(n):
            for i in range(j + 1, min(n, j + max_piece_len) + 1):
                p = probs.get(w[j:i])
                if p:
                    ecnt[w[j:i]] = ecnt.get(w[j:i], 0.0) + c * alpha[j] * p * beta[i] / z
    return ecnt


def _py_viterbi(
    word: str,
    probs: dict[str, float],
    max_piece_len: int,
    max_word_len: int = DEFAULT_MAX_WORD_LEN,
) -> tuple[list[str], float]:
    """Best segmentation of one word (ties: higher prob, fewer pieces,
    earlier start — same probability-PRODUCT rule as the relational DP).
    Over-cap words are unsegmentable by contract, like the relational DP;
    ``max_word_len`` mirrors the relational ``_effective_max_word_len``
    threading (ADVICE r7) so explicit caps agree across strategies."""
    if len(word) > max_word_len:
        return [], float("-inf")
    n = len(word)
    best: list = [None] * (n + 1)
    best[0] = (1.0, 0, [])
    for i in range(1, n + 1):
        cands = []
        for j in range(max(0, i - max_piece_len), i):
            p = probs.get(word[j:i])
            if p and best[j] is not None:
                vp, np_, path = best[j]
                cands.append((vp * p, np_ + 1, j, path + [word[j:i]]))
        if cands:
            # max vp; ties → fewer pieces, then earlier start
            cands.sort(key=lambda t: (-t[0], t[1], t[2]))
            vp, np_, _, path = cands[0]
            best[i] = (vp, np_, path)
    if best[n] is None:
        return [], float("-inf")
    vp, _, path = best[n]
    return path, math.log(vp) if vp > 0 else float("-inf")


def _py_train(
    words: dict[str, int],
    vocab_size: int,
    n_iters: int,
    max_piece_len: int,
    max_pieces: int,
    max_word_len: int = DEFAULT_MAX_WORD_LEN,
) -> list[tuple[str, float]]:
    """Pure-Python unigram-LM trainer: seed → EM × n_iters with pruning to
    vocab_size after each M-step (single chars never pruned)."""
    freq: dict[str, int] = {}
    for w, c in words.items():
        for s in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - s) + 1):
                piece = w[s : s + l]
                freq[piece] = freq.get(piece, 0) + c
    chars = {p: f for p, f in freq.items() if len(p) == 1}
    multi = sorted(
        ((p, f) for p, f in freq.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:max_pieces]
    sel = dict(chars)
    sel.update(dict(multi))
    tot = sum(sel.values())
    probs = {p: f / tot for p, f in sel.items()}
    for _ in range(n_iters):
        ecnt = _py_em_step(words, probs, max_piece_len, max_word_len)
        # drop pieces with zero expectation except single chars
        ecnt = {
            p: c
            for p, c in ecnt.items()
            if len(p) == 1 or c > 0.0
        }
        for p in chars:
            ecnt.setdefault(p, 0.0)
        # prune to vocab_size: single chars always kept
        singles = {p: c for p, c in ecnt.items() if len(p) == 1}
        # prune sort key rounds ecnt to 4 dp (same precision the EM oracle
        # checks at): last-ulp float differences between engines/strategies
        # cannot flip the keep/drop decision; residual ties break on piece
        multis = sorted(
            ((p, c) for p, c in ecnt.items() if len(p) >= 2),
            key=lambda t: (-round(t[1], 4), t[0]),
        )
        keep = dict(singles)
        for p, c in multis:
            if len(keep) >= vocab_size:
                break
            keep[p] = c
        tot = sum(keep.values())
        probs = {p: c / tot for p, c in keep.items()}
    return sorted(probs.items(), key=lambda t: (-t[1], t[0]))


def unigram_train(
    df: DataFrame,
    vocab_size: int = 40,
    n_iters: int = 3,
    max_piece_len: int = 4,
    max_pieces: int = 60,
    text_col: str = "text",
    strategy: str = "auto",
    local_vocab_limit: int = 2_000_000,
) -> list[tuple[str, float]]:
    """Train the unigram LM; returns [(piece, prob)] sorted
    (prob desc, piece asc).

    - ``local`` — collect the Heaps-bounded word-count table and run the
      in-memory EM (the production shape, same rationale as
      ``bpe_train``).
    - ``distributed`` — per EM iteration, one relational-DP E-step over
      the word relation; the vocab-sized expected-count table is collected
      for the driver-side M-step/prune (model parameters).
    - ``auto`` — local when the word table fits ``local_vocab_limit``.

    Both strategies produce identical pieces — asserted by a randomized
    differential test (test_unigram.py), including repeated-substring
    adversarial corpora.
    """
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError("strategy must be auto|local|distributed")
    wc = word_counts(df, text_col).localCheckpoint(eager=True)
    if strategy == "auto":
        strategy = "local" if wc.count() <= local_vocab_limit else "distributed"
    if strategy == "local":
        words = {r["word"]: int(r["cnt"]) for r in wc.collect()}
        return _py_train(words, vocab_size, n_iters, max_piece_len, max_pieces)

    spark = df.sparkSession
    max_wl = _effective_max_word_len(wc, None)
    seed = seed_pieces(wc, max_piece_len, max_pieces)
    srows = seed.collect()
    chars = [r["piece"] for r in srows if len(r["piece"]) == 1]
    tot = sum(r["freq"] for r in srows)
    probs = {r["piece"]: r["freq"] / tot for r in srows}
    for _ in range(n_iters):
        pdf = spark.createDataFrame(
            list(probs.items()), "piece string, prob double"
        )
        ecnt = {
            r["piece"]: r["ecnt"]
            for r in em_expected_counts(wc, pdf, max_piece_len, max_wl).collect()
        }
        ecnt = {p: c for p, c in ecnt.items() if len(p) == 1 or c > 0.0}
        for p in chars:
            ecnt.setdefault(p, 0.0)
        singles = {p: c for p, c in ecnt.items() if len(p) == 1}
        # same 4-dp-rounded prune key as _py_train — keeps the two
        # strategies' keep/drop decisions identical under last-ulp drift
        multis = sorted(
            ((p, c) for p, c in ecnt.items() if len(p) >= 2),
            key=lambda t: (-round(t[1], 4), t[0]),
        )
        keep = dict(singles)
        for p, c in multis:
            if len(keep) >= vocab_size:
                break
            keep[p] = c
        tot = sum(keep.values())
        probs = {p: c / tot for p, c in keep.items()}
    return sorted(probs.items(), key=lambda t: (-t[1], t[0]))


class UnigramTokenizer:
    """Trained unigram-LM artifact: (piece, prob) table in one JSON doc,
    same lifecycle contract as ``BPETokenizer``."""

    def __init__(self, pieces: list[tuple[str, float]], max_piece_len: int = 4):
        self.pieces = pieces
        self.max_piece_len = max_piece_len

    def probs(self) -> dict[str, float]:
        return dict(self.pieces)

    def segment(self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
        spark = df.sparkSession
        pdf = spark.createDataFrame(self.pieces, "piece string, prob double")
        wc = word_counts(df, text_col)
        seg = viterbi_segment_words(wc, pdf, self.max_piece_len)
        return unigram_segment(df, seg, text_col, id_col)

    def tokenize(self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
        return unigram_tokenize(df, self.pieces, self.max_piece_len, text_col, id_col)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "kind": "unigram_lm",
                    "pieces": [[p, pr] for p, pr in self.pieces],
                    "max_piece_len": self.max_piece_len,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "UnigramTokenizer":
        with open(path) as f:
            d = json.load(f)
        assert d["kind"] == "unigram_lm"
        return cls([(p, pr) for p, pr in d["pieces"]], d["max_piece_len"])


def train_unigram_tokenizer(
    df: DataFrame,
    vocab_size: int = 40,
    n_iters: int = 3,
    max_piece_len: int = 4,
    text_col: str = "text",
) -> UnigramTokenizer:
    pieces = unigram_train(
        df, vocab_size, n_iters, max_piece_len, text_col=text_col
    )
    return UnigramTokenizer(pieces, max_piece_len)
