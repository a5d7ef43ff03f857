"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship: full extraction pipeline over the sf0.001
                  documents table (interleaved deterministically), exploded
                  to flat span rows.
queries()      -- one entry per implemented operator (SURVEY.md §2 +
                  training-data ops); each (spark, sf_dir) -> DataFrame.
oracle_sql()   -- DuckDB-runnable ANSI SQL per query. Non-SQL-expressible
                  queries (extraction pipeline, minhash/simhash, ANN) use
                  inline VALUES oracles recomputed sequentially on the
                  driver (kernels / hashlib / numpy; see seq_oracles.py),
                  so the driver's hash compare is a genuine distributed-
                  vs-sequential equality gate for every query.
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
    for mod in (extraction, relational, textstats, dedup, similarity, multimodal):
        fn = getattr(mod, "oracles", None)
        out.update(fn() if fn is not None else mod.ORACLES)
    return out
