"""BPE training: hand-computed merges, left-to-right merge semantics,
segmentation round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataquality_ml_spark.operators.bpe import (
    apply_merge,
    bpe_init_vocab,
    bpe_pair_counts,
    bpe_segment,
    bpe_train,
    symbols,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_bpe_train_hand_computed(spark):
    # corpus: "low" x3, "lower" x1  → char pairs:
    # (l,o) 4, (o,w) 4, (w,</w>) 3, (w,e) 1, (e,r) 1, (r,</w>) 1
    df = _docs(spark, ["low low low lower"])
    merges = bpe_train(df, num_merges=3)
    # rank 1: tie (l,o)=(o,w)=4 → lexicographic lhs: ('l','o')
    assert merges[0][1:] == ("l", "o", 4)
    # rank 2: ('lo','w')=4 beats (w,</w>)=3
    assert merges[1][1:] == ("lo", "w", 4)
    # rank 3: ('low','</w>')=3
    assert merges[2][1:] == ("low", "</w>", 3)


def test_merge_left_to_right_consecutive(spark):
    # word "aaa": symbols a a a </w>; merging (a,a) must give [aa, a, </w>]
    # (left-to-right, the second 'a' is consumed), not [a, aa].
    df = _docs(spark, ["aaa"])
    vocab = bpe_init_vocab(df)
    merged = apply_merge(vocab, "a", "a")
    [row] = merged.select(symbols(F.col("word_str")).alias("s")).collect()
    assert row["s"] == ["aa", "a", "</w>"]


def test_pair_counts_weighted_by_word_freq(spark):
    df = _docs(spark, ["ab ab ab cd"])
    counts = {
        (r["lhs"], r["rhs"]): r["total"]
        for r in bpe_pair_counts(bpe_init_vocab(df)).collect()
    }
    assert counts[("a", "b")] == 3
    assert counts[("c", "d")] == 1
    assert counts[("b", "</w>")] == 3


def test_segment_counts_and_compression(spark):
    df = _docs(spark, ["low low", "lower"])
    merges = bpe_train(df, num_merges=2)  # (l,o) then (lo,w)
    seg = {r["doc_id"]: r for r in bpe_segment(df, merges).collect()}
    # doc 0: "low" -> [low, </w>] = 2 subwords each, 2 words
    assert seg[0]["n_words"] == 2
    assert seg[0]["n_subwords"] == 4
    # doc 1: "lower" -> [low, e, r, </w>] = 4 subwords
    assert seg[1]["n_subwords"] == 4
    assert abs(seg[1]["chars_per_subword"] - 5 / 4) < 1e-9


def test_train_stops_when_out_of_pairs(spark):
    # single 1-char word: only pair is (x, </w>); after merging it there
    # are no pairs left — train must stop early, not loop or crash.
    df = _docs(spark, ["x x"])
    merges = bpe_train(df, num_merges=5)
    assert [m[1:3] for m in merges] == [("x", "</w>")]


def _python_bpe(texts: list[str], num_merges: int):
    """Pure-Python reference BPE trainer (Sennrich et al. 2016 fig. 1
    semantics, same (count desc, lhs, rhs) tie-break)."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                words[tuple(w) + ("</w>",)] += 1
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for sym, cnt in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (lhs, rhs), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lhs, rhs, cnt))
        new_words = Counter()
        for sym, c in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == lhs and sym[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
    return merges


def test_bpe_differential_vs_python_reference(spark):
    """Randomized differential: the distributed separator-replace trainer
    equals a pure-Python list-walking BPE on many random corpora —
    including repeated-char words where left-to-right merge order and
    overlap handling actually bite."""
    import random

    rng = random.Random(13)
    alphabet = "abc"
    for trial in range(6):
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(4)
        ]
        expected = _python_bpe(texts, num_merges=4)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        got = bpe_train(df, num_merges=4)
        assert got == expected, f"trial {trial}: {texts}\n{got}\nvs\n{expected}"


def test_bpe_adversarial_backtoback_repeats(spark):
    """Adversarial differential (ADVICE r4): corpora where an early merge
    pair occurs CONSECUTIVELY in a word.  A single-separator replace
    consumes the shared separator and under-merges ('aaaa' + (a,a) →
    [aa,a,a] instead of [aa,aa]); the double-separator encoding must match
    the pure-Python list-walking trainer exactly, on both strategies."""
    for texts in (
        ["aaaa"],
        ["abab abab b"],
        ["banana banana ba"],
        ["aaaaaaaa aa a"],
        ["aaa aaaa aaaaa aaaaaa"],
        ["abababab ab ba"],
    ):
        expected = _python_bpe(texts, num_merges=4)
        df = _docs(spark, texts)
        for strategy in ("local", "distributed"):
            got = bpe_train(df, num_merges=4, strategy=strategy)
            assert got == expected, (texts, strategy, got, expected)


def test_apply_merge_equals_list_merge_on_runs(spark):
    """(a,a) over an 8-run must pair strictly left-to-right: [aa]×4.
    This is exactly where fixpoint-iterating a single-separator replace
    still fails (it gets stuck at [aa,a,aa,a,aa])."""
    df = _docs(spark, ["aaaaaaaa"])
    vocab = bpe_init_vocab(df)
    merged = apply_merge(vocab, "a", "a")
    [row] = merged.select(symbols(F.col("word_str")).alias("s")).collect()
    assert row["s"] == ["aa", "aa", "aa", "aa", "</w>"]


def test_duckdb_replace_matches_spark_merge_semantics():
    """The oracle's string algebra is the same single-pass replace DuckDB
    runs — assert DuckDB's replace on the double-separator encoding gives
    true-BPE pairing for the adversarial run case."""
    import duckdb

    [(out,)] = duckdb.sql(
        "SELECT list_filter(string_split(replace("
        "'··a··a··a··a··a··a··a··a··</w>··', '·a··a·', '·aa·'), '·'),"
        " x -> x <> '')"
    ).fetchall()
    assert out == ["aa", "aa", "aa", "aa", "</w>"]


def test_bpe_local_and_distributed_strategies_agree(spark):
    """The collected-vocab incremental trainer (the 32k-merge production
    path) and the distributed per-merge rounds produce identical merges."""
    import random

    rng = random.Random(99)
    for _ in range(3):
        texts = [
            " ".join(
                "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(5, 15))
            )
            for _ in range(3)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        local = bpe_train(df, num_merges=5, strategy="local")
        dist = bpe_train(df, num_merges=5, strategy="distributed")
        assert local == dist


def test_tokenizer_lifecycle_and_artifact_roundtrip(spark, tmp_path):
    from dataquality_ml_spark.operators.bpe import BPETokenizer, train_tokenizer

    df = _docs(spark, ["low low low lower"])
    tok = train_tokenizer(df, num_merges=2)  # merges: (l,o), (lo,w)
    # vocab: base chars sorted ({</w>, e, l, o, r, w}) then merged symbols
    assert tok.vocab["</w>"] == 0
    assert list(tok.vocab)[-2:] == ["lo", "low"]
    assert tok.vocab["low"] == max(tok.vocab.values())

    out = {r["doc_id"]: r for r in tok.tokenize(df).collect()}
    # "low low low lower": low→[low,</w>] ×3, lower→[low,e,r,</w>]
    ids = out[0]["token_ids"]
    low, eow = tok.vocab["low"], tok.vocab["</w>"]
    assert ids[:6] == [low, eow, low, eow, low, eow]
    assert out[0]["n_ids"] == 10

    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2.merges == tok.merges and tok2.vocab == tok.vocab
    assert (
        tok2.tokenize(df).collect()[0]["token_ids"] == out[0]["token_ids"]
    )


def test_tokenizer_unknown_symbols_map_to_unk(spark):
    from dataquality_ml_spark.operators.bpe import train_tokenizer

    train = _docs(spark, ["ab ab"])
    tok = train_tokenizer(train, num_merges=1)
    foreign = _docs(spark, ["xz"])  # chars never seen in training
    [row] = tok.tokenize(foreign).collect()
    assert row["token_ids"][:2] == [-1, -1]  # x, z unknown
    assert row["token_ids"][-1] == tok.vocab["</w>"]
