"""Cross-engine deterministic hashing primitives.

Spark's builtin `hash`/`xxhash64` (murmur/xxhash) have no DuckDB counterpart,
so every hash the oracle must reproduce is built from md5 (identical in both
engines) + integer arithmetic:

    fp(s) = first 15 hex chars of md5(s) as int  (60 bits, < 2^60)

verified bit-identical Spark vs DuckDB. MinHash permutations are
(a_i * x + b_i) mod P31 with P31 = 2^31 - 1; products stay < 2^62 (no int64
overflow in either engine). Coefficients are derived from a fixed LCG so the
Python-side Spark expressions and the generated oracle SQL share literals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 - 1 (prime)


def fingerprint(col: Column) -> Column:
    """60-bit integer fingerprint of a string; == FP_SQL in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fp_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}),1,15)) AS BIGINT)"


def lcg_coeffs(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs in [1, P31): a plain LCG, reproduced
    nowhere else — both engines receive these as literals."""
    out = []
    state = seed
    for _ in range(k):
        state = (1103515245 * state + 12345) % (2**31)
        a = state % (P31 - 1) + 1
        state = (1103515245 * state + 12345) % (2**31)
        b = state % P31
        out.append((a, b))
    return out
