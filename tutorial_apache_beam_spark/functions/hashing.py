"""Portable deterministic hashing (bit-identical in Spark and DuckDB).

Spark's native `hash`/`xxhash64` have no DuckDB twin, so every
sketch-based operator (MinHash, SimHash, fingerprints) builds on MD5 —
identical everywhere — truncated to 60 bits:

    Spark : conv(substring(md5(s), 1, 15), 16, 10) :: long
    DuckDB: ('0x' || substring(md5(s), 1, 15)) :: BIGINT

15 hex chars = 60 bits < 2^63, so the value is a non-negative BIGINT in
both engines (verified: md5('hello') prefix → 419982666956583591 in both).

MinHash permutations use universal hashing h_i(x) = (a_i·x + b_i) mod p
with p = 2^31 − 1. Inputs are first reduced mod p so a_i·x stays < 2^63 —
no overflow in either engine's int64 arithmetic.

Scale note: everything here is built-in expressions (JVM codegen in Spark);
no UDFs, so sketches vectorize and push through shuffles like any column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# Fixed pseudo-random (a, b) pairs for MinHash permutations — generated once
# (seeded) and frozen so Spark and DuckDB compute identical signatures.
MINHASH_COEFFS: list[tuple[int, int]] = [
    (472882049, 1284865837), (741349635, 921750187), (227882343, 1476316855),
    (842586895, 477729736), (223983867, 1046745879), (1329174177, 1735807132),
    (712894147, 530922251), (1554270231, 1954074011), (1318427183, 681024786),
    (1822905489, 1204131200), (767424031, 1527542613), (1041379483, 1987654321),
]


def portable_hash64(col: Column) -> Column:
    """60-bit non-negative hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """The identical hash in DuckDB SQL (oracle side)."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def minhash_signature(hashed_tokens: Column, k: int = 12) -> list[Column]:
    """k MinHash values over an array<long> of element hashes (Spark side).

    Each permutation is min((a·(x mod p) + b) mod p) over the array —
    pure array expressions, evaluated row-local (no shuffle).
    """
    # NB: the lambdas must be single-argument — F.transform interprets a
    # second parameter as the element index.
    def perm(a: int, b: int):
        return lambda x: (a * (x % MERSENNE_P) + b) % MERSENNE_P

    sigs = []
    for i in range(k):
        a, b = MINHASH_COEFFS[i]
        sigs.append(
            F.array_min(F.transform(hashed_tokens, perm(a, b))).alias(f"mh{i}")
        )
    return sigs


def minhash_signature_sql(hashed_list_expr: str, k: int = 12) -> list[str]:
    """The identical k MinHash values in DuckDB SQL."""
    out = []
    for i in range(k):
        a, b = MINHASH_COEFFS[i]
        out.append(
            f"list_min(list_transform({hashed_list_expr}, "
            f"x -> ({a} * (x % {MERSENNE_P}) + {b}) % {MERSENNE_P}))"
        )
    return out


def simhash32(hashed_tokens: Column) -> Column:
    """32-bit SimHash over an array<long> of element hashes (Spark side).

    Bit j of the result is set iff more element hashes have bit j set than
    unset. Row-local array expressions only.
    """
    def bit_vote(mask: int):
        return lambda x: F.when(x.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1)

    bit_terms = []
    for j in range(32):
        vote = F.aggregate(
            F.transform(hashed_tokens, bit_vote(1 << j)),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        bit_terms.append(F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return total.cast("long")


def simhash32_sql(hashed_list_expr: str) -> str:
    """The identical 32-bit SimHash in DuckDB SQL."""
    terms = []
    for j in range(32):
        vote = (
            f"list_sum(list_transform({hashed_list_expr}, "
            f"x -> CASE WHEN (x & {1 << j}) <> 0 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"
