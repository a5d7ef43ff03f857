"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship: full extraction pipeline over the sf0.001
                  documents table (interleaved deterministically), exploded
                  to flat span rows.
queries()      -- one entry per implemented operator (SURVEY.md §2 +
                  training-data ops); each (spark, sf_dir) -> DataFrame.
oracle_sql()   -- DuckDB-runnable ANSI SQL per query. Extraction-pipeline
                  queries use inline VALUES oracles generated from the
                  sequential kernel oracle, so the driver's hash compare IS
                  the span-sequence-equality gate. Keys intentionally absent
                  (minhash/simhash/LSH-ANN/extract_from_documents) are
                  non-SQL-expressible -> rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from local_pdftodocx_ocr_spark.operators import (  # noqa: E402
    dedup,
    extraction,
    multimodal,
    relational,
    similarity,
    textstats,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return extraction.extract_from_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (extraction, relational, textstats, dedup, similarity, multimodal):
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(extraction.oracles())
    for mod in (relational, textstats, dedup, similarity, multimodal):
        out.update(mod.ORACLES)
    return out
