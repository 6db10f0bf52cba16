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


# --- MinHash hash family -------------------------------------------------
#
# One md5 per shingle + k cheap Carter-Wegman affine maps, instead of k
# md5s per shingle (the round-7 family).  Profiling (r7 directive #4)
# put ~80% of the 1M-doc MinHash wall time in the signing pass, and
# ~all of that in per-(shingle, seed) md5 calls — the affine family
# cuts the md5 count 16x at num_hashes=16 with the same estimator
# guarantees (universal hashing over the 30-bit base domain).
#
# Bounds chosen so every intermediate fits EXACTLY in a signed 64-bit
# integer on all three engines (Spark long, DuckDB BIGINT, numpy
# int64): base hash masked to 30 bits, modulus P = 2^31 - 1 (Mersenne
# prime), a ∈ [1, P), b ∈ [0, P) ⇒ a*h + b < 2^61 + 2^31.  No
# wrapping, no HUGEINT.
#
# P must sit just ABOVE the base domain, not far above it: with a
# huge modulus (first attempt: 2^61 - 1) the product a*h spans less
# than one multiple of P, the map wraps at most once and is otherwise
# MONOTONIC in h — every hash function then picks the same
# min-base-hash shingle, the 16 signature slots collapse into one,
# and LSH banding degenerates into giant buckets (observed: the
# 1M-doc sweep OOM'd in the candidate self-join).  With h < 2^30 < P
# = 2^31 - 1 the product crosses ~a/2 multiples of P, which is the
# proper Carter-Wegman mixing regime.

MINHASH_P = (1 << 31) - 1
MINHASH_MASK = (1 << 30) - 1


def minhash_consts(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic ``(a_k, b_k)`` pairs for the affine family,
    derived from md5 so all engines agree by construction."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [((h60(f"mh_a:{k}") % (MINHASH_P - 1)) + 1,
             h60(f"mh_b:{k}") % MINHASH_P)
            for k in range(num_hashes)]


def minhash_base(c: Column) -> Column:
    """30-bit base hash of a shingle (Spark expression form)."""
    return stable_hash64(c).bitwiseAND(F.lit(MINHASH_MASK))


def minhash_base_sql(expr: str) -> str:
    """DuckDB rendering of :func:`minhash_base`."""
    return f"({stable_hash_sql(expr)} & {MINHASH_MASK})"
