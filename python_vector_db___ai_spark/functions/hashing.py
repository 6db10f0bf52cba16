"""Deterministic cross-engine hashing helpers.

Spark's built-in ``hash``/``xxhash64`` use murmur3/xxhash seeds that the
DuckDB oracle cannot reproduce, so every hash that participates in a
correctness-checked result is derived from ``md5`` (identical hex output
in both engines) and converted to an integer via base-16 ``conv``.

On the JVM this is still whole-stage-codegen'd (md5 + conv + cast are
built-in expressions), so it is scan-speed at 100 TB — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(c: Column) -> Column:
    """md5 hex digest of a string column (matches DuckDB ``md5(x)``)."""
    return F.md5(c.cast("binary"))


def stable_hash64(c: Column, seed: int = 0, bits: int = 60) -> Column:
    """Deterministic non-negative integer hash of a string column.

    Uses the first ``bits/4`` hex chars of ``md5(seed || value)`` — the
    DuckDB oracle computes the identical value with
    ``CAST(concat('0x', substr(md5(...), 1, n)) AS BIGINT)``.
    ``bits`` <= 60 keeps the value inside a signed 64-bit integer.
    """
    nhex = bits // 4
    prefixed = F.concat(F.lit(f"s{seed}:"), c) if seed else c
    return F.conv(F.substring(md5_hex(prefixed), 1, nhex), 16, 10).cast("long")


def stable_hash_sql(expr: str, seed: int = 0, bits: int = 60) -> str:
    """The DuckDB-SQL rendering of :func:`stable_hash64` for oracles."""
    nhex = bits // 4
    inner = f"concat('s{seed}:', {expr})" if seed else expr
    return f"CAST(concat('0x', substr(md5({inner}), 1, {nhex})) AS BIGINT)"
