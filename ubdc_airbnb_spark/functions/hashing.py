"""Portable deterministic hashing as native Spark expressions.

The engine needs hash functions that (a) run JVM-side with whole-stage
codegen — no Python UDFs in the hot path — and (b) are reproducible in
other engines (the DuckDB correctness oracle, reference implementations).
``xxhash64``/``hash`` are Spark-specific, so the portable primitive here
is md5 → take 15 hex digits (60 bits) → integer. One md5 per salt is
plenty for MinHash perms / LSH bands / dedup keys.

Used by operators/dedup.py (MinHash-LSH — SURVEY §2 north-star ops) and
exact-dedup keys (ref analog: md5_checksum unique key,
/root/reference/src/ubdc_airbnb/ubdc_airbnb/models.py:35).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Largest prime < 2^31; keeps modular polynomial hashes overflow-free in
#: 64-bit integer arithmetic on every engine.
MERSENNE31 = 2_147_483_647


def md5_long(col: Column | str, salt: str | None = None) -> Column:
    """60-bit non-negative integer hash of a string column.

    Portable equivalent (DuckDB): ``CAST(CONCAT('0x', SUBSTR(MD5(x), 1, 15))
    AS BIGINT)``; with a salt, ``MD5(x || '#' || salt)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(c, F.lit("#" + salt))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str | None = None) -> str:
    """The DuckDB-SQL twin of :func:`md5_long` (oracle construction)."""
    inner = expr if salt is None else f"({expr} || '#{salt}')"
    return f"CAST(CONCAT('0x', SUBSTR(MD5({inner}), 1, 15)) AS BIGINT)"


def rolling_fingerprint(col: Column | str, base: int = 131, mod: int = MERSENNE31) -> Column:
    """Polynomial rolling hash over the characters of a string column.

    ``h = fold(chars, 0, (acc, ch) -> (acc*base + ascii(ch)) % mod)`` — a
    classic Rabin-Karp document fingerprint, computed entirely with
    built-in higher-order functions (no UDF). ``acc*base`` stays below
    2^39, so 64-bit arithmetic never overflows and any engine reproduces
    it bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def rolling_fingerprint_sql(expr: str, base: int = 131, mod: int = MERSENNE31) -> str:
    """DuckDB twin of :func:`rolling_fingerprint`."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(acc, ch) -> (acc * {base} + ch) % {mod})"
    )
