"""Property-based tests (hypothesis) for the tokenizer-family reference
implementations.  These exercise the PURE-PYTHON twins of the distributed
operators — the same functions the differential tests compare against —
so hundreds of shrinkable random corpora run without a Spark round-trip.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from dataquality_ml_spark.operators.bpe import SEP, _bpe_train_inmem
from dataquality_ml_spark.operators.unigram import (
    _py_em_step,
    _py_viterbi,
    _py_train,
)

words_strategy = st.dictionaries(
    st.text(alphabet="abc", min_size=1, max_size=8),
    st.integers(min_value=1, max_value=5),
    min_size=1,
    max_size=8,
)


def _naive_bpe(words: dict[str, int], num_merges: int):
    """Sennrich fig.1 semantics, recounting from scratch every merge —
    the slowest, most obviously-correct formulation."""
    from collections import Counter

    tab = Counter()
    for w, c in words.items():
        tab[tuple(w) + ("</w>",)] += c
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for sym, c in tab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (lhs, rhs), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lhs, rhs, cnt))
        new = Counter()
        for sym, c in tab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == lhs and sym[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] += c
        tab = new
    return merges


@settings(max_examples=200, deadline=None)
@given(words=words_strategy, n=st.integers(min_value=1, max_value=6))
def test_incremental_bpe_equals_naive_recount(words, n):
    """The inverted-index incremental trainer (the 32k-merge production
    path) must equal the recount-everything formulation on ANY corpus —
    including the back-to-back-repeat shapes ADVICE r4 flagged."""
    enc = {
        SEP + SEP + (SEP + SEP).join(w) + SEP + SEP + "</w>" + SEP + SEP: c
        for w, c in words.items()
    }
    assert _bpe_train_inmem(enc, n) == _naive_bpe(words, n)


@settings(max_examples=150, deadline=None)
@given(words=words_strategy)
def test_em_step_conserves_character_mass(words):
    """Σ_pieces E[count]·len(piece) == total characters: every character
    is covered by exactly one piece in every segmentation, so the
    expectation must conserve mass whenever all words are segmentable."""
    freq: dict[str, int] = {}
    for w, c in words.items():
        for s in range(len(w)):
            for l in range(1, min(3, len(w) - s) + 1):
                p = w[s : s + l]
                freq[p] = freq.get(p, 0) + c
    tot = sum(freq.values())
    probs = {p: f / tot for p, f in freq.items()}
    ecnt = _py_em_step(words, probs, 3)
    covered = sum(c * len(p) for p, c in ecnt.items())
    total_chars = sum(len(w) * c for w, c in words.items())
    assert math.isclose(covered, total_chars, rel_tol=1e-9)


@settings(max_examples=150, deadline=None)
@given(words=words_strategy)
def test_viterbi_path_reconstructs_word_and_score(words):
    freq: dict[str, int] = {}
    for w, c in words.items():
        for s in range(len(w)):
            for l in range(1, min(3, len(w) - s) + 1):
                p = w[s : s + l]
                freq[p] = freq.get(p, 0) + c
    tot = sum(freq.values())
    probs = {p: f / tot for p, f in freq.items()}
    for w in words:
        path, lp = _py_viterbi(w, probs, 3)
        assert "".join(path) == w
        assert math.isclose(
            lp, sum(math.log(probs[p]) for p in path), rel_tol=1e-9
        )
        # no other segmentation beats it (exhaustive check on short words)
        if len(w) <= 5:
            best = max(
                (_seg_prob(s, probs) for s in _all_segs(w, 3)), default=0.0
            )
            assert math.isclose(math.exp(lp), best, rel_tol=1e-9)


def _all_segs(w: str, max_len: int):
    if not w:
        yield []
        return
    for l in range(1, min(max_len, len(w)) + 1):
        for rest in _all_segs(w[l:], max_len):
            yield [w[:l]] + rest


def _seg_prob(seg, probs):
    p = 1.0
    for piece in seg:
        p *= probs.get(piece, 0.0)
    return p


@settings(max_examples=60, deadline=None)
@given(words=words_strategy)
def test_unigram_train_returns_normalized_distribution(words):
    pieces = _py_train(words, vocab_size=10, n_iters=2, max_piece_len=3, max_pieces=8)
    assert math.isclose(sum(p for _, p in pieces), 1.0, rel_tol=1e-9)
    chars = {c for w in words for c in w}
    assert chars <= {p for p, _ in pieces}  # single chars never pruned
    probs = [p for _, p in pieces]
    assert probs == sorted(probs, reverse=True)


# ---------------------------------------------------------------------------
# Round 12: pure-python twins of the new statistics operators
# ---------------------------------------------------------------------------

from dataquality_ml_spark.functions.scalar import _jaro_py, _jaro_winkler_py


@given(
    st.text(alphabet="ab cd", max_size=16),
    st.text(alphabet="ab cd", max_size=16),
)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_properties(a, b):
    """JW ∈ [0,1], symmetric-jaro, identity=1, and the Winkler boost
    never decreases jaro."""
    j = _jaro_py(a, b)
    jw = _jaro_winkler_py(a, b)
    assert 0.0 <= j <= 1.0 and 0.0 <= jw <= 1.0
    assert _jaro_py(b, a) == j  # jaro is symmetric
    assert jw >= j - 1e-15  # boost only ever adds
    if a == b and a:
        assert jw == 1.0


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab cd", max_size=12),
            st.text(alphabet="ab cd", max_size=12),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=60, deadline=None)
def test_jaro_winkler_matches_duckdb_property(pairs):
    """The linkage scorer's hash-parity foundation: the python JW equals
    DuckDB's native jaro_winkler_similarity on arbitrary short strings
    (shrinkable counterexamples if an edge ever diverges)."""
    import duckdb

    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert _jaro_winkler_py(a, b) == want, (a, b)
    con.close()


@given(
    st.lists(
        st.floats(
            min_value=0.0, max_value=1e6, allow_nan=False, allow_subnormal=False
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_gini_rank_formula_properties(xs):
    """The rank formulation the distributed Gini implements: bounded in
    [-(1/n), 1), zero for constants, scale-invariant, and equal to the
    mean-absolute-difference definition."""
    n = len(xs)
    s = sum(xs)
    xs_sorted = sorted(xs)
    if s == 0:
        return  # all-zero: statistic undefined (0/0)
    g = 2 * sum((i + 1) * x for i, x in enumerate(xs_sorted)) / (n * s) - (n + 1) / n
    # definitional Gini: mean absolute difference / (2 * mean)
    mad = sum(abs(a - b) for a in xs for b in xs) / (n * n)
    g_def = mad / (2 * (s / n))
    assert abs(g - g_def) < 1e-9 * max(1.0, abs(g_def))
    assert -1.0 / n - 1e-12 <= g < 1.0
    if len(set(xs)) == 1:
        assert abs(g) < 1e-12


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_fd_g3_properties(rows):
    """g3 bounds: 0 ≤ g3_rows ≤ n − |groups|; zero iff the FD holds;
    deleting the counted rows makes the FD hold exactly."""
    from collections import Counter, defaultdict

    per_x = defaultdict(Counter)
    for k, y in rows:
        per_x[k][y] += 1
    n = len(rows)
    g3 = sum(sum(c.values()) - max(c.values()) for c in per_x.values())
    assert 0 <= g3 <= n - len(per_x)
    holds = all(len(c) == 1 for c in per_x.values())
    assert (g3 == 0) == holds
