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

# MinHash runs in a 44-bit hash space (11 hex chars) so one universal
# hash ``a*h + b`` stays inside int64 without split arithmetic under
# ANSI overflow checking: a ≤ 2^17, h < 2^44 ⇒ a*h < 2^61.
MINHASH_BITS = 44
MINHASH_PRIME = 17_592_186_044_423  # smallest prime > 2^44
MINHASH_MAX_A = 1 << 17


def md5_int64(col: Column | str, salt: str = "", hex_chars: int = 15) -> Column:
    """Deterministic non-negative int64 from the md5 prefix of a string
    column (60-bit with the default 15 hex chars).

    DuckDB equivalent: ``('0x' || substr(md5(salt || x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, hex_chars), 16, 10).cast("long")


def md5_int64_sql_duckdb(expr: str, salt: str = "", hex_chars: int = 15) -> str:
    """The DuckDB-side expression matching :func:`md5_int64`."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"(('0x' || substr(md5({inner}), 1, {hex_chars}))::BIGINT)"


def md5_int44(col: Column | str, salt: str = "") -> Column:
    """44-bit variant used by MinHash permutations."""
    return md5_int64(col, salt, hex_chars=MINHASH_BITS // 4)


def minhash_perm(hash_col: Column, a: int, b: int) -> Column:
    """One universal-hash permutation ``(a*h + b) mod P`` of a 44-bit
    hash. Same expression shape in DuckDB:
    ``(a * h + b) % 17592186044423``."""
    if not 0 < a < MINHASH_MAX_A:
        raise ValueError(f"a must be in (0, 2^17) to avoid int64 overflow, got {a}")
    return (hash_col * F.lit(a) + F.lit(b % MINHASH_PRIME)) % F.lit(MINHASH_PRIME)
