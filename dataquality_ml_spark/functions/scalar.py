"""Engine-portable scalar expression helpers.

Pure ``pyspark.sql.functions`` compositions — JVM-side, inside
whole-stage codegen — with ONE deliberate exception: unicode
normalization, which Spark has no builtin for, runs as an Arrow-batched
pandas UDF with an ASCII fast path (see ``unicode_normalize``).  Each
helper has an exact DuckDB equivalent so every operator built on them is
oracle-checkable:

- ``portable_hash32``  ⇔  ``CAST('0x' || substr(md5(x),1,8) AS BIGINT)``
- ``tokens``           ⇔  ``string_split_regex(trim(lower(nfc_normalize(x))), '\\s+')``
- ``shingles``         ⇔  list-comprehension over ``generate_series``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNICODE_FORMS = ("NFC", "NFKC", "NFD", "NFKD")
_NORM_UDFS: dict = {}

# Stack of active default unicode forms; the top is what normalize_text /
# tokens use when the caller does not pass an explicit form.
_ACTIVE_UNICODE_FORM: list = ["NFC"]
_DEFAULT = "__default__"


class pre_normalized:
    """Plan-construction context: inside the block, ``normalize_text`` /
    ``tokens`` skip the per-operator NFC pass because the caller
    guarantees the text is ALREADY normalized (typically via one
    ``normalize_unicode`` projection at the head of the query — the
    in-process analogue of ingest-time normalization).

    This is a construction-time switch, not an execution-time one: it
    affects expressions BUILT inside the ``with`` block, which is exactly
    when query functions assemble their plans.  Single-threaded plan
    construction assumed (true for the bench and the driver contract).

    Without this, a query that tokenizes the corpus k times pays k Arrow
    round-trips for byte-identical output; with it, exactly one.
    """

    def __enter__(self):
        _ACTIVE_UNICODE_FORM.append(None)
        return self

    def __exit__(self, *exc):
        _ACTIVE_UNICODE_FORM.pop()
        return False


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Unicode normalization (default NFC) as an Arrow-batched pandas UDF.

    Spark ships no normalization builtin, and the two tempting shortcuts
    both fail: ``reflect`` over the bundled ICU is marked nondeterministic
    (breaks Generate/explode contexts, blocks filter pushdown through the
    projection — a scale-killer — and NPEs on nulls), and pyarrow 16's
    C++ ``utf8_normalize`` kernel does not actually compose (NFC output
    equals NFD — verified empirically).  So: the sanctioned Python escape
    hatch, kept cheap — one vectorized C-speed regex marks the non-ASCII
    rows of each Arrow batch and only THOSE pay the per-element
    ``unicodedata.normalize``; an all-ASCII batch costs a single regex
    scan plus the Arrow round-trip.  Nulls pass through.

    DuckDB oracle equivalent (NFC only): ``nfc_normalize(x)``.  CPython
    and utf8proc both implement UAX#15 canonical composition, which is
    stable across Unicode versions for assigned codepoints.
    """
    if form not in _UNICODE_FORMS:
        raise ValueError(f"form must be one of {_UNICODE_FORMS}")
    if form not in _NORM_UDFS:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _make(f: str):
            def _norm(s):
                import unicodedata

                mask = s.str.contains(r"[^\x00-\x7F]", regex=True, na=False)
                if not mask.any():
                    return s
                out = s.copy()
                out[mask] = out[mask].map(lambda x: unicodedata.normalize(f, x))
                return out

            # real annotation objects: `from __future__ import annotations`
            # would stringize inline hints, which pandas_udf can't resolve
            _norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
            return pandas_udf(_norm, "string")

        _NORM_UDFS[form] = _make(form)
    c = F.col(col) if isinstance(col, str) else col
    return _NORM_UDFS[form](c)


def normalize_text(col: Column | str, unicode_form: str | None = _DEFAULT) -> Column:
    """NFC + lowercase + trim — the shared normalization for fingerprints
    and shingles.  Unicode canonical composition runs FIRST (NFD and NFC
    encodings of identical text must hash identically, or every dedup
    operator silently under-merges on multilingual corpora); pass
    ``unicode_form=None`` — or build the plan inside ``pre_normalized()``
    — to skip it when the input is already canonical.  The DuckDB oracle
    mirror is ``trim(lower(nfc_normalize(x)))``."""
    c = F.col(col) if isinstance(col, str) else col
    if unicode_form == _DEFAULT:
        unicode_form = _ACTIVE_UNICODE_FORM[-1]
    if unicode_form is not None:
        c = unicode_normalize(c, unicode_form)
    return F.trim(F.lower(c))


def tokens(col: Column | str, unicode_form: str | None = _DEFAULT) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(col, unicode_form), r"\s+")


def fold_accents(col: Column | str) -> Column:
    """Diacritic folding: NFD decomposition (the shared Arrow-batched
    normalizer) followed by a JVM-side regexp that strips combining marks
    — 'Café' → 'Cafe'.  The matcher/fuzzy-dedup companion to NFC: NFC
    makes equal text hash equal; accent folding makes NEAR-equal text
    (diacritic variants of the same word) compare equal.  DuckDB oracle
    equivalent: ``strip_accents(x)`` (verified: both drop Mn marks after
    canonical decomposition)."""
    return F.regexp_replace(unicode_normalize(col, "NFD"), r"\p{M}", "")


def portable_hash32(col: Column | str) -> Column:
    """Deterministic 32-bit string hash identical across engines:
    first 8 hex digits of md5, parsed as an unsigned int."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def portable_hash60(col: Column | str) -> Column:
    """60-bit variant (first 15 hex digits of md5) for join keys where
    32-bit birthday collisions would matter; still bigint-safe in every
    engine."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def shingles(tok_col: Column, k: int) -> Column:
    """Distinct k-word shingles from a token array (w-shingling for
    MinHash / Jaccard dedup). Pure array expressions — no UDF, no shuffle.

    Guarded for docs shorter than k tokens: Spark's ``sequence(1, n)``
    turns DESCENDING for n < 1 and the resulting index 0 makes ``slice``
    throw — short docs yield an empty array instead."""
    idx = F.sequence(F.lit(1), F.size(tok_col) - (k - 1))
    return F.when(
        F.size(tok_col) >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok_col, i, k)))
        ),
    ).otherwise(F.array().cast("array<string>"))


def bow_fingerprint(col: Column | str) -> Column:
    """Order-insensitive bag-of-words fingerprint: md5 of the sorted
    distinct token list — catches shuffled-word duplicates that an exact
    text hash misses."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def _jaro_py(a: str, b: str) -> float:
    """Standard Jaro similarity (Jaro 1989): match window
    ⌊max(|a|,|b|)/2⌋−1, transpositions = half the out-of-order matches.
    Pure integer/rational arithmetic until the final three divisions, so
    the value is bit-identical across engines implementing the textbook
    definition (differentially tested against DuckDB's
    jaro_similarity on random pairs)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    win = max(la, lb) // 2 - 1
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - win), min(lb, i + win + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3


def _jaro_winkler_py(a: str, b: str, p: float = 0.1, thresh: float = 0.7) -> float:
    """Jaro-Winkler (Winkler 1990): prefix boost l·p·(1−jaro) for the
    common prefix l ≤ 4, applied only above the 0.7 threshold — the
    variant DuckDB's jaro_winkler_similarity implements (bit-identical
    on 3000 random pairs in the round-12 differential)."""
    j = _jaro_py(a, b)
    if j <= thresh:
        return j
    l = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        l += 1
    return j + l * p * (1 - j)


def jaro_winkler_udf():
    """Arrow-batched pandas UDF (string, string) → double of
    :func:`_jaro_winkler_py` — the record-linkage verifier for candidate
    pairs from sorted-neighborhood / LSH blocking. Null inputs → null.
    Vectorized at the batch level (the per-pair DP is O(|a|·|b|) python,
    fine for the short keys linkage compares); never row-at-a-time
    ``udf()``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no inline type hints: `from __future__ import annotations` stringizes
    # them and pandas_udf cannot resolve the local 'pd' (same pitfall as
    # unicode_normalize above) — the return-type string carries the schema
    def _batch(a, b):
        return pd.Series(
            [
                None if (x is None or y is None) else _jaro_winkler_py(x, y)
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    return pandas_udf(_batch, "double")
