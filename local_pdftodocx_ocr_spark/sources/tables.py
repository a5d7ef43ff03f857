"""Table readers.

Centralizes how the engine reads its inputs so format concerns
(parquet today; Iceberg identifiers on a cluster with the runtime jar)
stay out of operator code. Every reader returns a plain DataFrame and
relies on Catalyst for pushdown/pruning — readers never .cache() or
.collect().
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schema import DOCS_SCHEMA

TPCH_TABLES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem")
AUX_TABLES = ("events", "documents", "embeddings")


# The scan-parallelism probe (df.rdd.getNumPartitions) costs a full
# physical-planning round trip on the driver, and every query
# construction pays it again for the same input. The partition count of
# a parquet path is a property of the files + session config, so it is
# memoized per (application, path); callers without a stable path key
# keep probing directly.
_SCAN_PARTS: dict[tuple[str, str], int] = {}


def spread_scan(spark: SparkSession, df: DataFrame,
                key: str | None = None) -> DataFrame:
    """Repartition a scan ONLY when it is under-parallel.

    Local small-file reality: a single-row-group parquet file scans as
    ONE partition, which would serialize CPU-heavy downstream work
    (tokenize/shingle/signature) onto one core. But an unconditional
    repartition is a full shuffle of the raw corpus before map-only
    work — at 100 TB that is a gratuitous exchange on a scan that
    already has thousands of row groups. So: shuffle only when the scan
    has fewer partitions than the cluster's parallelism (the plan test
    pins that a pre-partitioned input produces no REPARTITION node).

    ``key`` (normally the parquet path) memoizes the partition-count
    probe per session — see _SCAN_PARTS."""
    target = spark.sparkContext.defaultParallelism
    if key is not None:
        ck = (spark.sparkContext.applicationId, key)
        n = _SCAN_PARTS.get(ck)
        if n is None:
            n = df.rdd.getNumPartitions()
            _SCAN_PARTS[ck] = n
    else:
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One of the driver's benchmark tables by name."""
    if name not in TPCH_TABLES + AUX_TABLES:
        raise KeyError(f"unknown table {name!r}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for SQL-first callers (mirrors the driver's DuckDB
    view registration, so the same SQL text runs on both engines)."""
    for name in TPCH_TABLES + AUX_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_interleaved_docs(spark: SparkSession, path: str) -> DataFrame:
    """The extraction input: either an interleaved (doc_id, spans)
    table, or a flat (doc_id, text) documents table which is
    deterministically interleaved first (synth.spans_from_flat_doc)."""
    df = spark.read.parquet(path)
    if "spans" in df.columns:
        return df.select("doc_id", "spans")
    if {"doc_id", "text"} <= set(df.columns):
        from ..job import interleaved_docs_from_flat
        return interleaved_docs_from_flat(df)
    raise ValueError(
        f"input at {path} must have (doc_id, spans) or (doc_id, text); "
        f"got {sorted(df.columns)}")


def empty_docs(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], DOCS_SCHEMA)


_FLAT_SCHEMA = "doc_id long, text string"


def read_corpus_input(spark: SparkSession, path: str,
                      fmt: str | None = None) -> DataFrame:
    """The extraction job's input in any supported format.

    * parquet — the native path: either the interleaved (doc_id, spans)
      table or the flat documents table.
    * jsonl / csv — flat (doc_id, text) corpora as ingest feeds produce
      them. Schemas are declared, never inferred: at 100 TB an
      inference pass is a second full scan of the corpus.

    ``fmt=None`` sniffs the extension (.jsonl/.ndjson, .csv; everything
    else reads as parquet). A bare ``.json`` is deliberately NOT
    sniffed: Spark's json reader is line-delimited, so a whole-file
    JSON array would parse to all-null rows silently — pass
    fmt='jsonl' explicitly for line-delimited .json files.

    CSV reads with multiLine=True: document text routinely contains
    newlines, which standard CSV carries inside quotes — under
    multiLine=False such a row silently splits into malformed records.
    The cost is that a multiLine CSV FILE is not splittable (one task
    per file); corpora at scale should arrive as many files, or better
    as jsonl/parquet (both splittable)."""
    if fmt is None:
        low = path.lower().rstrip("/")
        if low.endswith((".jsonl", ".ndjson")):
            fmt = "jsonl"
        elif low.endswith(".csv"):
            fmt = "csv"
        else:
            fmt = "parquet"
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "jsonl":
        return spark.read.schema(_FLAT_SCHEMA).json(path)
    if fmt == "csv":
        return (spark.read.option("header", True)
                .option("multiLine", True)
                .option("escape", '"')
                .schema(_FLAT_SCHEMA).csv(path))
    raise ValueError(f"unknown input format {fmt!r} "
                     "(expected parquet | jsonl | csv)")
