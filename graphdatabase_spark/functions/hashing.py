"""Portable deterministic hashing used by dedup / similarity / fingerprints.

Everything funnels through md5 so the DuckDB oracle can reproduce the
exact same integers: Spark's ``hash()``/``xxhash64()`` are
Murmur3/xxHash with Spark-specific seeds and DuckDB's ``hash()`` is its
own — they never agree. ``md5`` agrees everywhere, and taking the first
15 hex chars gives a uniform 60-bit non-negative int64 in both engines:

- Spark:  ``conv(substring(md5(x), 1, 15), 16, 10)::long``
- DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``

md5 is ~1 GB/s/core JVM-side and stays inside whole-stage codegen; at
100 TB the hashing cost is dwarfed by the shuffle it feeds. Swap-in
point for xxhash64 is documented where Spark-only determinism suffices.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit hash space (15 hex chars), non-negative, fits int64.
HASH_BITS = 60
HASH_SPACE = 1 << HASH_BITS

# A Mersenne-ish prime > 2^60 for MinHash permutations (a*h+b mod P).
MINHASH_PRIME = 1152921504606847009  # smallest prime > 2^60


def md5_int64(col: Column | str, salt: str = "") -> Column:
    """Deterministic 60-bit non-negative int64 of a string column.

    DuckDB equivalent: ``('0x' || substr(md5(salt || x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_int64_sql_duckdb(expr: str, salt: str = "") -> str:
    """The DuckDB-side expression matching :func:`md5_int64`."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"(('0x' || substr(md5({inner}), 1, 15))::BIGINT)"


def minhash_perm(hash_col: Column, a: int, b: int) -> Column:
    """One universal-hash permutation ``(a*h + b) mod P`` of a 60-bit hash.

    Multiplying two 60-bit ints overflows int64, so the permutation is
    computed in split arithmetic that stays within int64 — identical
    expressions are used in the DuckDB oracle. a is kept < 2^20 so
    ``a * h < 2^80`` splits cleanly into hi/lo 30-bit halves.
    """
    # h = hi*2^30 + lo ; a*h mod P = (a*hi mod P * 2^30 mod P + a*lo) mod P
    hi = (hash_col / F.lit(1 << 30)).cast("long")
    lo = hash_col % F.lit(1 << 30)
    p = F.lit(MINHASH_PRIME)
    term_hi = ((hi * F.lit(a)) % p * F.lit(1 << 30)) % p
    return (term_hi + lo * F.lit(a) + F.lit(b)) % p
