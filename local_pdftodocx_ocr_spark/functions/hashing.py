"""Cross-engine-reproducible hash expressions (pure JVM, no UDF).

The engine's deterministic-by-hash discipline (dedup keys, sketch
values, split buckets) rests on md5 prefixes converted to integers:
md5 is available and bit-identical in Spark, DuckDB, and hashlib, so
the IDENTICAL (negligible) collisions happen on every engine and
cross-engine equality stays exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_60bit(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative LongType.

    60 bits (15 hex chars) is the widest md5 prefix that is BOTH inside
    BIGINT range on every engine (DuckDB mirror:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT`` — or ``::UBIGINT``)
    AND leaves headroom under Spark 4's ANSI 2^62 arithmetic guard for
    downstream modular math. Used as the shuffle key for dedup shingles
    (8-byte longs instead of ~25-byte strings) and as the KMV sketch
    hash.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_bucket_rho(col: Column, p: int) -> tuple[Column, Column]:
    """HyperLogLog (bucket, rho) split of md5_60bit(col) for 2^p
    registers: bucket = low p bits, rho = leading zeros of the
    remaining (60-p)-bit residue + 1. Integer-only (pmod + shiftright
    + minimal-binary bit length — h / 2^p in Spark would be lossy
    DOUBLE division above 2^53); the DuckDB mirror is
    ``h % 2^p`` / ``CASE WHEN h // 2^p = 0 THEN 60-p+1 ELSE 60-p+1 -
    length(bin(h // 2^p)) END``. Shared by the batch sketch
    (textstats.hll_distinct_shingles) and the streaming register grid
    (streaming.events_stream.hll_registers_stream) so both produce
    identical registers over identical rows."""
    m = 1 << p
    rho_max = 60 - p + 1
    h = md5_60bit(col)
    rem = F.shiftright(h, p)
    rho = F.when(rem == 0, F.lit(rho_max)) \
           .otherwise(F.lit(rho_max) - F.length(F.bin(rem)))
    return F.pmod(h, F.lit(m)), rho
