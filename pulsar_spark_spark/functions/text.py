"""Text analysis functions: tokenization, n-grams, language ID,
quality scoring, fingerprinting, MinHash/SimHash primitives.

The tokenizer generalizes the reference's address tokenizer
(service/SmartAddressBuildService.scala:135-153: lowercase, strip
``[^a-z ]``, emit word 2-grams and 3-grams). Everything else is the
training-data-pipeline extension surface (dedup / quality / lang-id),
built expression-first so it runs JVM-side.

Design rule for hash functions: anything that must be oracle-checked
in DuckDB uses md5-derived integers (``conv(substr(md5(x),1,15),16,10)``
≡ DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT``) — identical on
both engines, stable across runs, no dependence on Spark's internal
murmur seed. 15 hex chars (60 bits), NOT 16: a 16th char would need
UINT64, which signed-BIGINT Spark cannot hold — an oracle written to
a 16-char version of this contract disagrees on every hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# ---------------------------------------------------------------------
# tokenization / n-grams (expression-only)
# ---------------------------------------------------------------------


def clean_text(col: Column) -> Column:
    """Lowercase and strip everything but [a-z ] (reference F5 cleaning,
    SmartAddressBuildService.scala:220-221)."""
    return F.regexp_replace(F.lower(col), "[^a-z ]", "")


def tokens(col: Column) -> Column:
    """Whitespace tokens of the cleaned text (array<string>)."""
    t = F.split(F.trim(clean_text(col)), " +")
    return F.filter(t, lambda x: x != "")


def word_ngrams(tok: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (reference F5 emits 2- and
    3-grams). Built with sequence+transform — no UDF, no explode until
    the caller wants one. Guarded for short inputs: Spark's
    ``sequence(0, -1)`` is DESCENDING ``[0,-1]``, so without the guard
    a doc with <n tokens would emit junk n-grams."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tok) - n),
        lambda i: F.array_join(F.slice(tok, i + 1, n), " "),
    )
    return F.when(F.size(tok) >= n, grams).otherwise(
        F.expr("CAST(array() AS ARRAY<STRING>)")
    )


def char_shingles_of_clean(cleaned: Column, k: int = 5) -> Column:
    """Character k-shingles of ALREADY-CLEANED text (array<string>).

    The ``transform`` lambda embeds ``cleaned`` verbatim and Spark
    re-evaluates non-lambda subtrees once PER ELEMENT, so pass a bound
    attribute (a column that exists on the relation), never an
    expression: embedding ``clean_text`` here runs its regex once per
    shingle — measured 3.9× the wall of the whole shingle-hash stage
    at 100× data. Short-input guarded for the same descending-sequence
    reason as :func:`word_ngrams`."""
    shingles = F.transform(
        F.sequence(F.lit(1), F.length(cleaned) - (k - 1)),
        lambda i: cleaned.substr(i, F.lit(k)),
    )
    return F.when(F.length(cleaned) >= k, shingles).otherwise(
        F.expr("CAST(array() AS ARRAY<STRING>)")
    )


def char_shingles(col: Column, k: int = 5) -> Column:
    """Character k-shingles of the cleaned text (array<string>).

    Convenience form that cleans inline — fine for ad-hoc use on small
    relations; hot pipelines should project :func:`clean_text` once
    and shingle the resulting column via
    :func:`char_shingles_of_clean` (see its per-element caveat)."""
    return char_shingles_of_clean(clean_text(col), k)


# ---------------------------------------------------------------------
# hashing primitives (oracle-parity md5 scheme)
# ---------------------------------------------------------------------


def winnow_minima(grams: Column, w: int) -> Column:
    """Distinct window-minima fingerprints of a POSITIONAL gram-hash
    array — true winnowing (Schleimer, Wilkerson & Aiken, SIGMOD'03):
    for every window of ``w`` consecutive grams keep the window
    minimum; a document with fewer than ``w`` grams (but ≥ 1) keeps
    its global minimum, so no non-empty document fingerprints to
    nothing. ``w=1`` degenerates to ``array_distinct(grams)`` — the
    select-everything behavior the df-cap tests pin in isolation.

    Selection is VALUE-level (the fingerprint set is the distinct
    minima values), so the rightmost-vs-leftmost tie rule of the
    paper's robust variant cannot change the output — ties select the
    same value either way. Guarantee: any shared run of ≥ w
    consecutive grams between two documents shares ≥ 1 fingerprint;
    expected density is 2/(w+1) of the distinct grams, the ~w/2×
    reduction that keeps the downstream gram self-join linear.

    Scale shape: a pure per-row expression (sequence + slice +
    array_min inside one transform) — whole-stage-codegen'd JVM work,
    NO window function, NO per-doc shuffle or sort. O(n·w) element
    touches per doc; at w=8 that constant beats shipping w/2× more
    rows into the gram-keyed join by an order of magnitude.

    CALLER CONTRACT: pass a bound attribute (a projected column), not
    an inline expression — the lambda embeds ``grams`` verbatim and
    Spark re-evaluates non-lambda subtrees per element (the
    char_shingles_of_clean trap).
    """
    if w <= 1:
        return F.array_distinct(grams)
    sel = F.transform(
        F.sequence(F.lit(w), F.size(grams)),
        lambda i: F.array_min(F.slice(grams, i - w + 1, w)),
    )
    return (
        F.when(F.size(grams) >= w, F.array_distinct(sel))
        .when(F.size(grams) > 0, F.array(F.array_min(grams)))
        .otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
    )


def md5_i64(col: Column) -> Column:
    """First 60 bits of md5(x) as a non-negative bigint.

    60 bits (15 hex chars) keeps the value inside signed-64 positive
    range on both engines. DuckDB equivalent:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# Universal-hash permutations for MinHash: perm_i(s) = (a_i·h + b_i)
# mod P over the Mersenne prime P = 2^31−1, with h = md5_i64(s) mod P.
# ONE md5 per shingle (the md5 is the cost at corpus scale) and 16
# integer transforms instead of 16 md5s — a_i·h < 2^62 stays inside
# BIGINT on both engines. Constants are fixed digits of the md5 of the
# permutation index, so both expression builders embed the same
# literals.
MINHASH_P = 2_147_483_647


def _mh_constants(i: int) -> tuple[int, int]:
    import hashlib

    d = hashlib.md5(f"minhash-perm:{i}".encode()).hexdigest()
    a = int(d[:15], 16) % (MINHASH_P - 1) + 1
    b = int(d[15:30], 16) % MINHASH_P
    return a, b


def shingle_hashes(shingles: Column) -> Column:
    """md5-hash a shingle set to integers mod P, once.

    Callers should materialize (cache) this column before fanning out
    to the 16 permutations: Spark does not common-subexpression-
    eliminate through higher-order-function lambdas, so embedding the
    md5 inside every permutation would run it 16×.
    """
    return F.array_distinct(F.transform(shingles, lambda s: md5_i64(s) % MINHASH_P))


def minhash_signature_from_hashes(
    hvals: "Column | str", n_hashes: int = 16
) -> Column:
    """MinHash signature from pre-hashed shingle ints (cheap integer
    transforms only — the md5 cost was paid once in shingle_hashes).

    Each permutation minimum is a scalar-accumulator ``aggregate``
    (``least(acc, (h·a+b) mod P)``), NOT ``array_min(transform(…))``:
    ``transform`` materializes a full transformed copy of the hash
    array per permutation per row — at the corpus-adaptive 96-hash
    plan that is ~96 × |hv| × 8 B of allocation churn per document
    (~220 KB/row at 288 shingles), measured round 9 as the dominant
    stage of the 100×/1000× near-dup walls. The scalar fold computes
    the identical value (min over the same transformed elements —
    empty arrays yield NULL either way, guarded explicitly) with zero
    array allocations, and it is NOT the nested-HOF shape that fell
    out of codegen in the round-7 fused-bucket experiment (the
    accumulator is a scalar, not an array).

    Pass ``hvals`` as a SQL fragment (usually the bound column name)
    on hot paths: the whole n-permutation signature then parses
    JVM-side in ONE call, where the Column-API form costs ~6 py4j
    round-trips per permutation — profiled round 15 at 0.44 s of
    DRIVER time per plan build at 16 hashes (the sign_bucket lesson
    from plans/similarity.py, applied to the text family). Both forms
    produce identical values (pinned in tests/test_functions.py).
    """
    if isinstance(hvals, str):
        perms = []
        for i in range(n_hashes):
            a, b = _mh_constants(i)
            agg = (
                f"aggregate({hvals}, CAST({MINHASH_P} AS BIGINT), "
                f"(acc, h) -> least(acc, (h * CAST({a} AS BIGINT) "
                f"+ CAST({b} AS BIGINT)) % CAST({MINHASH_P} AS BIGINT)))"
            )
            perms.append(
                f"(CASE WHEN size({hvals}) = 0 THEN CAST(NULL AS BIGINT) "
                f"ELSE {agg} END)"
            )
        return F.expr("array(" + ", ".join(perms) + ")")

    # NB: PySpark higher-order functions pass one argument per lambda
    # parameter, so the ``lambda h, i=i`` default-arg idiom would bind
    # ``i`` to a second lambda variable — capture via closure instead.
    def _perm_min(a: int, b: int) -> Column:
        return F.aggregate(
            hvals,
            F.lit(MINHASH_P).cast("long"),
            lambda acc, h: F.least(acc, (h * a + b) % MINHASH_P),
        )

    empty = F.size(hvals) == 0
    sigs = [
        F.when(empty, F.lit(None).cast("long")).otherwise(
            _perm_min(*_mh_constants(i))
        )
        for i in range(n_hashes)
    ]
    return F.array(*sigs)


def minhash_signature(shingles: Column, n_hashes: int = 16) -> Column:
    """MinHash signature: array of n universal-hash permutation minima.

    Fully expression-based → bit-identical in the DuckDB oracle.
    """
    return minhash_signature_from_hashes(shingle_hashes(shingles), n_hashes)


def lsh_bands(
    signature: "Column | str", n_bands: int, rows_per_band: int
) -> Column:
    """Band the signature for LSH: array of 'band_idx:md5(band values)'.

    Documents sharing any band key are near-dup candidates; join on
    the exploded key. bands × rows must equal the signature length.
    A SQL-fragment ``signature`` builds the whole band array in one
    JVM parse (the minhash_signature_from_hashes py4j rationale);
    identical values either way (pinned in tests/test_functions.py).
    """
    if isinstance(signature, str):
        bands_sql = ", ".join(
            f"concat('{b}:', md5(array_join(slice({signature}, "
            f"{b * rows_per_band + 1}, {rows_per_band}), ',')))"
            for b in range(n_bands)
        )
        return F.expr(f"array({bands_sql})")
    bands = [
        F.concat(
            F.lit(f"{b}:"),
            F.md5(
                F.array_join(
                    F.slice(signature, b * rows_per_band + 1, rows_per_band), ","
                )
            ),
        )
        for b in range(n_bands)
    ]
    return F.array(*bands)


def simhash16_from_hashes(h: Column) -> Column:
    """16-bit SimHash from PRE-HASHED token ints.

    ``h`` appears inside all 16 bit aggregates and Spark re-evaluates
    it per aggregate, so pass a bound attribute (project the
    ``transform(tok, md5_i64)`` hash array as a real column first) —
    embedding the hash chain here runs tokenize + md5-per-token 16×.

    For each bit b: sum over tokens of ±1 depending on bit b of the
    token's md5-int; bit set iff the sum > 0. 16 bits keeps the
    expression tree small enough to stay oracle-expressible.
    """

    def _bit_merge(b: int):
        return lambda acc, x: acc + F.when(
            x.bitwiseAND(F.lit(1 << b)) > 0, 1
        ).otherwise(-1)

    bits = [
        F.when(F.aggregate(h, F.lit(0), _bit_merge(b)) > 0, F.lit(1 << b)).otherwise(0)
        for b in range(16)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def simhash16(tok: Column) -> Column:
    """16-bit SimHash over whitespace tokens (inline-hash convenience
    form — hot pipelines should project the hash array once and use
    :func:`simhash16_from_hashes`; see its 16× caveat)."""
    return simhash16_from_hashes(F.transform(tok, md5_i64))


# ---------------------------------------------------------------------
# language ID / quality / fingerprint
# ---------------------------------------------------------------------

# Tiny per-language marker lexicons (public stopwords). Scoring =
# count of marker-word hits; argmax wins, ties resolved by the fixed
# order below. Deliberately simple so the oracle can reproduce it.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr": ("le", "les", "des", "est", "dans", "une", "pour", "qui"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "zh": ("de5", "shi4", "le5", "zai4", "wo3", "you3", "ta1", "men5"),
}


def lang_scores(tok: Column) -> dict[str, Column]:
    """Marker-hit count per language over a token array."""

    def _hit(markers: tuple[str, ...]):
        return lambda x: x.isin(*markers)

    return {
        lang: F.size(F.filter(tok, _hit(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


LANG_ORDER = tuple(LANG_MARKERS)  # en, es, fr, de, zh — tie priority


def lang_id(tok: Column) -> Column:
    """Predicted language: argmax over marker-hit counts with the
    FIXED tie-priority order en > es > fr > de > zh (ties are common
    on short or out-of-lexicon documents). Pure expression — the
    marker lists ship with the expression, so the classifier is a map
    at any scale."""
    scores = lang_scores(tok)
    pred = None
    for i, lang in enumerate(LANG_ORDER):
        later = LANG_ORDER[i + 1 :]
        if not later:
            return pred.otherwise(F.lit(lang))
        cond = None
        for other in later:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = (
            F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
        )
    raise AssertionError("unreachable: LANG_ORDER is non-empty")


def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic document-quality features (expression-only).

    n_chars, n_tokens, avg token length, stopword ratio (English
    markers), punctuation ratio, uppercase ratio.
    """
    tok = F.split(F.trim(text), "\\s+")
    tok = F.filter(tok, lambda x: x != "")
    n_tokens = F.size(tok)
    n_chars = F.length(text)
    stop_hits = F.size(F.filter(tok, lambda x: F.lower(x).isin(*LANG_MARKERS["en"])))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, "[A-Z]", ""))
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.length(F.array_join(tok, "")) / safe_tokens,
        "stopword_ratio": stop_hits / safe_tokens,
        "punct_ratio": n_punct / safe_chars,
        "upper_ratio": n_upper / safe_chars,
    }


def fingerprint64(text: Column) -> Column:
    """Order-insensitive 60-bit document fingerprint: md5 of the
    sorted distinct token set (canonical dedup key — robust to token
    reordering, unlike raw md5(text))."""
    tok = F.array_sort(F.array_distinct(tokens(text)))
    return md5_i64(F.array_join(tok, " "))
