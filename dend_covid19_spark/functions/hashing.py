"""Engine-portable deterministic hashing for dedup operators.

MinHash/SimHash need the *same* hash values inside Spark and inside the
DuckDB oracle. Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are
different algorithms, so both engines derive 32-bit integer hashes from
``md5`` (identical everywhere) via the leading 8 hex chars:

    Spark:  CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)
    DuckDB: CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)

MinHash uses K universal-hash functions h_i(x) = (a_i * x + b_i) mod P
over those 32-bit values, with P = 2^31 - 1 (Mersenne prime) and
a_i < 2^30 so a_i * (x mod P) stays < 2^61 — no int64 overflow in either
engine (DuckDB errors on overflow; Spark ANSI mode would too).

The a_i/b_i constants are generated once from a fixed seed and inlined
into both the Spark expressions and the oracle SQL.

At scale: everything here is per-row compute inside whole-stage codegen
(no UDFs, no shuffles); cost is O(K * shingles) per document and
embarrassingly parallel.
"""

from __future__ import annotations

import random

P = 2_147_483_647  # 2^31 - 1
K = 32  # minhash signature length
BANDS = 8
ROWS = K // BANDS  # 4 rows/band -> LSH threshold ~ (1/8)^(1/4) ~ 0.59
SIMHASH_BITS = 32

_rng = random.Random(20260813)
MINHASH_A = [_rng.randrange(1, 1 << 30) for _ in range(K)]
MINHASH_B = [_rng.randrange(0, P) for _ in range(K)]

LONG_MAX = (1 << 63) - 1


def spark_hash32(expr: str) -> str:
    """Spark SQL: 32-bit md5-derived hash of a string expression."""
    return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def duck_hash32(expr: str) -> str:
    """DuckDB SQL: identical 32-bit md5-derived hash."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 8)) AS BIGINT)"


def spark_tokens(text: str = "text") -> str:
    return f"split({text}, ' ')"


def duck_tokens(text: str = "text") -> str:
    return f"string_split({text}, ' ')"


def spark_shingles(toks: str, n: int = 3) -> str:
    """Distinct n-token shingles as a sorted array<string> (Spark SQL).

    Sorted because Spark's ``array_distinct`` keeps first-occurrence order
    while DuckDB's ``list_distinct`` does not guarantee any order; sorting
    makes the value identical in both engines, and every downstream
    consumer (MinHash min-fold, Jaccard set overlap) is order-insensitive.
    """
    return (
        f"array_sort(array_distinct(transform(sequence(1, greatest(size({toks}) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice({toks}, i, {n})))))"
    )


def duck_shingles(toks: str, n: int = 3) -> str:
    """Same sorted shingle set in DuckDB (list slice upper bound is inclusive)."""
    return (
        f"list_sort(list_distinct(list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))))"
    )


def spark_shingle_hashes(shingles: str) -> str:
    return f"transform({shingles}, s -> {spark_hash32('s')})"


def duck_shingle_hashes(shingles: str) -> str:
    return f"list_transform({shingles}, s -> {duck_hash32('s')})"


def spark_minhash_sig(hashes: str) -> str:
    """K-element minhash signature (array<bigint>) via a single zip_with
    over the constant a/b arrays, one fold-min per (a, b) — all inside
    whole-stage codegen, no explode/shuffle.

    Written as zip_with-over-constants rather than K spelled-out
    aggregates: the generated Java is ~K times smaller, which cuts the
    one-time whole-stage-codegen/JIT compile from seconds to negligible
    while producing identical values.
    """
    a_arr = "array(" + ",".join(f"{a}L" for a in MINHASH_A) + ")"
    b_arr = "array(" + ",".join(f"{b}L" for b in MINHASH_B) + ")"
    return (
        f"zip_with({a_arr}, {b_arr}, (a, b) -> "
        f"aggregate({hashes}, CAST({LONG_MAX} AS BIGINT), "
        f"(acc, h) -> least(acc, (a * (h % {P}) + b) % {P})))"
    )


def duck_minhash_sig(hashes: str) -> str:
    elems = [
        f"list_min(list_transform({hashes}, h -> ({a} * (h % {P}) + {b}) % {P}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    return "[" + ", ".join(elems) + "]"


def spark_band_structs(sig: str) -> str:
    """Explodeable array of (band_id, band_key) structs for LSH banding."""
    return (
        f"transform(sequence(0, {BANDS - 1}), "
        f"j -> struct(j AS band_id, md5(concat_ws('-', slice({sig}, j * {ROWS} + 1, {ROWS}))) AS band_key))"
    )


def spark_token_hashes(toks: str) -> str:
    return f"transform({toks}, t -> {spark_hash32('t')})"


def duck_token_hashes(toks: str) -> str:
    return f"list_transform({toks}, t -> {duck_hash32('t')})"


def spark_simhash(th: str) -> str:
    """32-bit SimHash fingerprint from per-token 32-bit hashes: for each
    bit, +1/-1 vote per token occurrence; bit set iff vote sum > 0.

    Single pass over the hash array: one fold accumulates all 32 per-bit
    vote counters (zip_with against a bit-index sequence), then a second
    fold packs the sign bits into the fingerprint. Compared with 32
    spelled-out per-bit aggregates this shrinks the generated Java ~32x
    (negligible codegen/JIT compile) and scans the token-hash array once
    per row instead of 32 times.
    """
    votes = (
        f"aggregate({th}, array_repeat(0L, {SIMHASH_BITS}), "
        f"(acc, h) -> zip_with(acc, sequence(0, {SIMHASH_BITS - 1}), "
        f"(a, b) -> a + IF((shiftright(h, CAST(b AS INT)) & 1) = 1, 1L, -1L)))"
    )
    return (
        f"aggregate({votes}, struct(0L AS s, 0 AS i), "
        f"(acc, v) -> struct(acc.s + IF(v > 0, shiftleft(1L, acc.i), 0L) AS s, acc.i + 1 AS i), "
        f"acc -> acc.s)"
    )


def duck_simhash(th: str) -> str:
    """DuckDB twin of spark_simhash; pass a CTE column name holding the
    precomputed token-hash list."""
    bit_terms = [
        (
            f"CASE WHEN list_sum(list_transform({th}, "
            f"h -> CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END)) > 0 "
            f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
        for b in range(SIMHASH_BITS)
    ]
    return "(" + " + ".join(bit_terms) + ")"
