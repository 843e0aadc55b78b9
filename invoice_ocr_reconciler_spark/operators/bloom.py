"""Bloom-filter semi-join pruning: cut a huge scan down to probable matches
before the exact join.

At 100 TB the dominant cost of `big JOIN small` is shuffling `big`. When the
join is selective, building a Bloom filter over the small side's keys and
filtering `big` BEFORE the exchange removes most rows at scan time — the
manual form of Spark's runtime row-level filtering, usable where the
optimizer won't inject it (e.g. across separately-materialized stages).

Spark's internal `bloom_filter_agg` expression is not SQL-registered, so the
filter is built from public APIs only: the k bit positions are computed
JVM-SIDE (`pmod(xxhash64(key, seed), m)`), the driver collects the <= n*k
distinct positions (the keys side is dimension-sized — the same constraint a
broadcast join already imposes) and assembles the bitset once; the
membership probe on the big side is pure whole-stage-codegen arithmetic over
a hex-string literal (substr -> conv -> mask), no Python crossing and no
UDF.

The Bloom pass is a pre-filter: false positives are removed by the exact
semi join that follows, so results are EXACTLY the semi join's (the DuckDB
oracle replays a plain semi join) while the shuffle sees only |matches| +
|false positives| rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BYTE_MASKS = [1, 2, 4, 8, 16, 32, 64, 128]


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    # hash the STRING form: xxhash64 hashes IntegerType and LongType
    # differently, so an int big_key probing a bitset built from a long
    # keys_key would never match — string-normalizing both sides makes the
    # probe type-agnostic (and the exact semi join still enforces real
    # equality semantics afterwards)
    norm = col.cast("string")
    return [
        F.pmod(F.xxhash64(norm, F.lit(seed)), F.lit(m_bits)) for seed in range(k)
    ]


def _norm_bits(m_bits: int) -> int:
    """Round up to a whole number of bytes; positions range over the full
    rounded size so build and probe must both use this."""
    return (int(m_bits) + 7) // 8 * 8


def build_bloom_hex(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 18, k: int = 2
) -> str:
    """Bitset of the keys' hash positions, hex-encoded (2 chars/byte)."""
    m_bits = _norm_bits(m_bits)
    pos_cols = _positions(F.col(key_col), m_bits, k)
    pos = (
        keys.select(F.explode(F.array(*pos_cols)).alias("p"))
        .distinct()
        .collect()
    )
    bits = bytearray(m_bits // 8)
    for r in pos:
        p = int(r["p"])
        bits[p >> 3] |= _BYTE_MASKS[p & 7]
    return bits.hex()


def might_contain_col(col: Column, bloom_hex: str, m_bits: int, k: int = 2) -> Column:
    """All k bits set -> probable member. Pure codegen: per hash, pick the
    byte out of the hex literal with substr, decode with conv, AND with the
    bit mask from a literal array."""
    m_bits = _norm_bits(m_bits)
    masks = F.array(*[F.lit(v) for v in _BYTE_MASKS])
    hex_lit = F.lit(bloom_hex)
    keep = F.lit(True)
    for p in _positions(col, m_bits, k):
        byte_hex = hex_lit.substr(
            (F.floor(p / 8) * 2 + 1).cast("int"), F.lit(2)
        )
        byte_val = F.conv(byte_hex, 16, 10).cast("int")
        mask = F.element_at(masks, F.pmod(p, F.lit(8)).cast("int") + F.lit(1))
        keep = keep & (byte_val.bitwiseAND(mask) > 0)
    return keep


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str | None = None,
    m_bits: int = 1 << 18,
    k: int = 2,
) -> DataFrame:
    """big LEFT SEMI keys, with a Bloom pre-filter on the big side.

    Size m_bits ~ 10x the real key cardinality for ~1-3% false positives at
    k=2. The bitset ships as a literal inside the task binary (m_bits/4
    hex chars; 2^18 bits = 64 KiB string).
    """
    # the bitset ships as a plan literal: cap it well below codegen /
    # task-binary limits (2^24 bits = 4 MiB hex). Bigger key sides should
    # shrink m or fall back to a plain semi join.
    if m_bits > 1 << 24:
        raise ValueError("m_bits > 2^24: bitset literal too large to ship")
    m_bits = _norm_bits(m_bits)
    kk = keys_key or big_key
    # build and probe must hash the SAME normalized form of equal keys.
    # The string cast alone covers same-type and integral-vs-integral, but
    # int 5 stringifies '5' while double 5.0 stringifies '5.0' — a
    # cross-family pair the exact semi join WOULD match (Catalyst coerces
    # both to double) gets silently pre-filtered out. Normalize through
    # the join's own coercion: both numeric -> double when families mix;
    # refuse un-coercible mixes rather than drop rows.
    bt = dict(big.dtypes)[big_key]
    kt = dict(keys.dtypes)[kk]
    integral = {"tinyint", "smallint", "int", "bigint"}
    fractional = {"float", "double"}
    numeric = integral | fractional

    def _norm_col(c: Column, own: str, other: str) -> Column:
        if own == other or (own in integral and other in integral):
            return c
        if own in numeric and other in numeric:
            return c.cast("double")  # same lossy map on BOTH sides
        raise TypeError(
            f"bloom_semi_join key types {own!r} vs {other!r} do not "
            f"string-normalize to one hash form — cast the sides to a "
            f"common type first"
        )

    bloom_hex = build_bloom_hex(
        keys.select(_norm_col(F.col(kk), kt, bt).alias(kk)),
        kk,
        m_bits=m_bits,
        k=k,
    )
    pruned = big.filter(
        might_contain_col(
            _norm_col(F.col(big_key), bt, kt), bloom_hex, m_bits=m_bits, k=k
        )
    )
    return pruned.join(
        keys.select(F.col(kk).alias(big_key)).distinct(),
        big_key,
        "left_semi",
    )
