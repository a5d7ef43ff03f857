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
