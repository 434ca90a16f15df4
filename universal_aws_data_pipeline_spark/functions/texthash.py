"""Text normalization, tokenization, shingling, and portable hashing.

Hashing is md5-based on purpose: Spark's ``hash()``/``xxhash64()`` and
DuckDB's ``hash()`` are different algorithms, but ``md5`` hex strings are
identical everywhere — which makes MinHash/SimHash signatures reproducible
across engines (and therefore oracle-checkable). md5 is ~2-3x slower than
xxhash64, but both are JVM-side and the cost is dwarfed by the shuffle in any
dedup join; swap in xxhash64 via ``hash_fn`` when cross-engine parity isn't
needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(text: Column) -> Column:
    """lowercase, strip non-alphanumerics to spaces, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of normalized text."""
    return F.split(normalize_text(text), " ")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; whole normalized text when shorter than n.

    Array expression (transform over an index sequence) — no explode, no
    shuffle; shingling stays row-local and codegen'd.

    The token array is LET-BOUND via a one-element outer ``transform``
    (its lambda argument is a materialized VALUE): Spark HOF lambdas have
    no common-subexpression elimination, so referencing ``tokens_col(text)``
    directly inside the per-index lambda re-ran normalize+split over the
    whole document 2n times PER SHINGLE — O(tokens × doc_length) per row,
    invisible on ~50-token fixture docs but ~2e9 character ops per
    book-length document (round-8 longdocs stress finding; q52 on the 13.9k
    token fixture went from stuck-for-minutes to seconds).
    """

    def _build(tk: Column) -> Column:
        def _shingle(i: Column) -> Column:
            return F.concat_ws(
                " ", *[F.element_at(tk, i + F.lit(k + 1)) for k in range(n)]
            )

        return F.array_distinct(
            F.when(
                F.size(tk) >= n,
                F.transform(F.sequence(F.lit(0), F.size(tk) - n), _shingle),
            ).otherwise(
                # NULL text must stay [NULL] (the DuckDB oracle's `ELSE
                # [norm]` branch yields [NULL] there): concat_ws never
                # returns NULL, so without the guard a NULL-text document
                # would collide with an empty-string one in every shingle /
                # minhash fingerprint (round-8 ADVICE).
                F.array(
                    F.when(tk.isNull(), F.lit(None).cast("string")).otherwise(
                        F.concat_ws(" ", tk)
                    )
                )
            )
        )

    # concat_ws(" ", tokens) == normalize_text(text) for NON-NULL input
    # (normalization collapses whitespace and trims, so rejoining the tokens
    # reproduces it exactly) — keeps the short-document branch inside the
    # let-bound scope; the isNull guard covers the one input concat_ws
    # cannot reproduce.
    return F.element_at(F.transform(F.array(tokens_col(text)), _build), 1)


def md5_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(text))


def seeded_md5(value: Column, seed: int) -> Column:
    """Portable seeded hash: md5 of 'seed|value' (hex string, orderable)."""
    return F.md5(F.concat(F.lit(f"{seed}|"), value))


ROLLING_BASE = 31
ROLLING_MOD = (1 << 31) - 1


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash (Rabin–Karp shape) over normalized tokens:
    ``h = fold(tokens, (h*31 + digest(tok)) mod 2^31-1)`` with a 28-bit md5
    token digest. Order-sensitive (unlike a bag-of-words md5), overflow-free
    (31*2^31 + 2^28 < 2^36), and bit-identical in DuckDB's ``list_reduce``
    for the oracle. One fold per document — map-only."""
    digests = F.transform(
        tokens_col(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long"),
    )
    return F.aggregate(
        digests,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_BASE + x) % ROLLING_MOD,
    )
