"""Text primitives for the training-data-pipeline operators.

Everything here is built from native higher-order functions
(``transform``/``filter``/``aggregate`` — JVM-side, codegen'd, zero Python in
the hot path) so the dedup/text operators scale per-row with no UDF overhead.

Cross-engine determinism: all hashing is ``md5(seed || token)`` — bitwise
identical in Spark and DuckDB — which is what makes MinHash/SimHash
fingerprints oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text: Column | str) -> Column:
    """Whitespace tokenization (single-space; matches DuckDB string_split)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(ws: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array; empty when the doc has < n words.

    Spark: ``transform(sequence(0, size-n), i -> concat_ws(' ', slice(ws,i+1,n)))``
    mirrors DuckDB ``list_transform(range(len-n+1), i -> array_to_string(ws[i+1:i+n], ' '))``.
    """
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def seeded_hash(seed: int, token: Column) -> Column:
    """Deterministic per-seed hash: md5('<seed>:' || token), hex string.

    String-min over these behaves as an independent-ish permutation per seed
    (the standard k-mins MinHash construction)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), token))


#: Hex chars per MinHash slice: 8 hex = 32 bits per hash function.
MINHASH_SLICE = 8
#: Slices carved from one md5 (32 hex chars / 8).
_SLICES_PER_MD5 = 4


def minhash_slice(j: int, token: Column) -> Column:
    """MinHash function j: an 8-hex-char slice of md5('<j//4>:' || token).

    One md5 yields four independent 32-bit slices, so k functions cost
    ⌈k/4⌉ digests per token instead of k — Spark's subexpression
    elimination shares the md5 across the k min-aggregates (measured 1.76s
    → 1.09s for the sf0.1 LSH pipeline). String-min over fixed-width hex ≡
    numeric min over the 32-bit values, so this is still the standard
    k-mins construction."""
    group, offset = j // _SLICES_PER_MD5, (j % _SLICES_PER_MD5) * MINHASH_SLICE + 1
    return F.substring(seeded_hash(group, token), offset, MINHASH_SLICE)


def minhash_aggs(token_col: str, k: int) -> list[Column]:
    """k MinHash aggregate expressions over an exploded token column."""
    return [
        F.min(minhash_slice(j, F.col(token_col))).alias(f"mh{j}") for j in range(k)
    ]


def attach_minhash(df, sset_col: str, k: int):
    """Attach the k MinHash columns ``mh0..mh{k-1}`` as a NARROW map over a
    distinct-token ARRAY column — no explode, no aggregate, no exchange.

    Use ONLY to build frames that are PERSISTED for several consumers
    (`_shingle_features`, `blocked_jaccard`): the per-row form keeps the
    shingle array and its signatures in ONE cached row, so the banded
    candidate generation and both exact-verify join sides share a single
    materialization.  It is NOT a general replacement for the explode +
    ``groupBy(doc_id).agg(min(substring(md5)))`` signature aggregate: the
    r12 interleaved A/B at sf0.1 measured the projection form 0.94 →
    2.22 s SLOWER end-to-end on the uncached LSH pipeline, because
    higher-order functions (``transform``/``array_min``) evaluate outside
    whole-stage codegen — interpreted per-row lambdas and ~k+⌈k/4⌉ boxed
    array traversals per document — while the explode form's md5 +
    ``min`` compile into the scan stage (its SortAggregate pair is
    cheaper than the interpreted projection).  Plan shape is not the
    whole story; measure (guide §1).

    Value equivalence to the aggregate form is exact: ``F.min`` and
    ``array_min`` both take the UTF8 lexicographic minimum of the identical
    ``minhash_slice`` strings and both ignore nulls (md5 of a non-null
    token is never null).  Callers must pre-filter empty arrays
    (``size(sset) > 0``) to reproduce the explode form's row set — explode
    emitted no row for a shingle-less document, array_min would emit NULL.

    One md5 digest array per seed group is materialized as a named column
    and shared by its four 8-hex-char slice minima (the
    ``minhash_slice`` layout), so the digest count per token is unchanged
    (⌈k/4⌉)."""
    # single-argument closures: F.transform sniffs the lambda's arity, so a
    # default-argument binding (lambda s, g=g: ...) would be treated as the
    # two-arg (element, index) form and receive the index as g
    def _digest(g: int):
        return lambda s: F.md5(F.concat(F.lit(f"{g}:"), s))

    def _slice(off: int):
        return lambda x: F.substring(x, off, MINHASH_SLICE)

    groups = (k + _SLICES_PER_MD5 - 1) // _SLICES_PER_MD5
    out = df
    for g in range(groups):
        out = out.withColumn(
            f"_mhd{g}", F.transform(F.col(sset_col), _digest(g))
        )
    for j in range(k):
        g = j // _SLICES_PER_MD5
        off = (j % _SLICES_PER_MD5) * MINHASH_SLICE + 1
        out = out.withColumn(
            f"mh{j}",
            F.array_min(F.transform(F.col(f"_mhd{g}"), _slice(off))),
        )
    return out.drop(*[f"_mhd{g}" for g in range(groups)])


def band_hash(minhash_cols: list[str], band: int, rows_per_band: int) -> Column:
    """LSH banding: hash the band's minhash slice into one bucket key."""
    parts = [
        F.col(minhash_cols[band * rows_per_band + r]) for r in range(rows_per_band)
    ]
    return F.md5(F.concat_ws("|", *parts))


def simhash_bit_value(bit: int, token: Column) -> Column:
    """±1 contribution of a token to SimHash bit ``bit``: parity of the first
    hex char of md5('<bit>:' || token). Matches DuckDB
    ``ascii(substr(md5(...),1,1)) % 2``."""
    parity = F.ascii(F.substring(seeded_hash(bit, token), 1, 1)) % 2
    return parity * 2 - 1


def char_ngrams(text: Column, n: int = 8) -> Column:
    """Character n-grams (for winnowing-style fingerprints)."""
    return F.when(
        F.length(text) >= n,
        F.transform(
            F.sequence(F.lit(0), F.length(text) - n),
            lambda i: F.substring(text, i + 1, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


#: Tiny public stopword sets used by the language-ID heuristic and quality
#: scores. Deliberately small: the point is the operator plumbing, not NLP
#: accuracy.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "is", "in")
MARKERS = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "los", "las", "que", "por", "una"),
    "fr": ("le", "les", "et", "est", "une", "dans"),
    "en": STOPWORDS_EN,
}


def count_in(ws: Column, vocab: tuple[str, ...]) -> Column:
    """Occurrences of vocabulary words in a token array (JVM-side filter)."""
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(ws, lambda w: F.array_contains(vocab_arr, w)))
