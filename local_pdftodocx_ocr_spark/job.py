"""The distributed extraction job.

Physical plan (designed for 1000 executors / 100 TB; tested on local[N]):

  read input (doc_id, spans)                 -- Iceberg/parquet scan;
                                                column-pruned, snapshot-based
  [resume] LEFT ANTI JOIN committed doc_ids  -- the only cluster-wide join
  repartition(P, xxhash64(doc_id, salt))     -- salted hash defuses
                                                large-document key skew
                                                (north rule; SURVEY.md §2.9 R1)
  mapInPandas(extract_batch)                 -- ONE Arrow-batched pass:
                                                route/clean/recognize/dedup/
                                                order kernels per document,
                                                one batched recognize call
                                                per Arrow batch, plus one
                                                lineage row per partition
  write parquet snapshot -> atomic commit    -- idempotent restart point

No per-row Python anywhere: documents cross the Python boundary once, as
Arrow record batches; everything else is JVM-side.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import kernels
from .catalog import open_table
from .schema import DOCS_SCHEMA, UNIFIED_SCHEMA

DEFAULT_SALT = 0x5CA1AB1E


def build_session(parallelism: int = 0, app: str = "pdf2spans",
                  shuffle_partitions: int | None = None) -> SparkSession:
    """Local-mode session tuned per /opt guide: AQE on, Arrow on,
    shuffle partitions ~= cores (not 200)."""
    cores = parallelism or os.cpu_count() or 4
    return (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # the generated-code cache defaults to 100 entries; a session
        # that plans hundreds of distinct stages (the 65-query suite,
        # iterative loops) evicts and re-Janino-compiles identical
        # shapes. Scale-independent: the cache holds compiled classes,
        # not data.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body. Per Arrow batch: one recognize_batch call over
    every media_ref in the batch (the batched "OCR" step, reference
    src/ocr_engine.py:899-954), then the per-document kernel pipeline.
    After the partition drains, emit exactly one lineage row."""
    ctx = TaskContext.get()
    partition_id = ctx.partitionId() if ctx is not None else -1
    t0 = time.monotonic()
    docs_in = 0
    docs_out = 0
    checksum_acc = 0

    for pdf in batches:
        # ---- batched recognize: collect every media_ref once ----
        refs: set[str] = set()
        for spans in pdf["spans"]:
            if spans is None:
                continue
            for s in spans:
                r = s["media_ref"]
                if r:
                    refs.add(r)
        ref_list = sorted(refs)
        media_text = dict(zip(ref_list, kernels.recognize_batch(ref_list)))

        out_ids: list[str] = []
        out_spans: list = []
        row_types: list[str] = []
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            docs_in += 1
            # spans pass through untouched (Arrow hands us an ndarray of
            # dicts; kernels only read) and the output tuples go straight
            # back to Arrow — no per-span dict materialization in the hot
            # loop (the round-1 version double-allocated every span).
            tuples = kernels.extract_document(doc_id, spans, media_text)
            if not tuples:
                # quarantine row: marks the doc as processed (so resume
                # skips it) without polluting the spans table
                out_ids.append(doc_id)
                out_spans.append(None)
                row_types.append("quarantine")
                continue
            docs_out += 1
            checksum_acc = (checksum_acc + kernels.doc_checksum(doc_id, tuples)) % kernels._CHECK_MOD
            out_ids.append(doc_id)
            out_spans.append(tuples)
            row_types.append("doc")
        n = len(out_ids)
        yield pd.DataFrame({
            "row_type": pd.Series(row_types, dtype="object"),
            "doc_id": pd.Series(out_ids, dtype="object"),
            "spans": pd.Series(out_spans, dtype="object"),
            "partition_id": pd.array([None] * n, dtype="Int32"),
            "docs_in": pd.array([None] * n, dtype="Int64"),
            "docs_out": pd.array([None] * n, dtype="Int64"),
            "checksum": pd.Series([None] * n, dtype="object"),
            "wall_ms": pd.array([None] * n, dtype="Int64"),
        })

    wall_ms = int((time.monotonic() - t0) * 1000)
    yield pd.DataFrame({
        "row_type": pd.Series(["lineage"], dtype="object"),
        "doc_id": pd.Series([None], dtype="object"),
        "spans": pd.Series([None], dtype="object"),
        "partition_id": pd.array([partition_id], dtype="Int32"),
        "docs_in": pd.array([docs_in], dtype="Int64"),
        "docs_out": pd.array([docs_out], dtype="Int64"),
        "checksum": pd.Series([format(checksum_acc, "016x")], dtype="object"),
        "wall_ms": pd.array([wall_ms], dtype="Int64"),
    })


def extract_spans(docs: DataFrame, num_partitions: int | None = None,
                  salt: int = DEFAULT_SALT) -> DataFrame:
    """docs (doc_id, spans) -> unified (doc rows + lineage rows).

    The explicit ``repartition(P, xxhash64(doc_id, salt))`` is the north
    rule's skew defuse: doc_id ranges that hash hot (e.g. crawl shards
    with mega-documents) spread uniformly; AQE still coalesces small
    post-shuffle partitions."""
    n = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    salted = docs.repartition(n, F.xxhash64(F.col("doc_id"), F.lit(salt)))
    return salted.mapInPandas(extract_batch, schema=UNIFIED_SCHEMA)


# ---------------------------------------------------------------------------
# Oversized-document chunking (the second half of the skew story):
# salted repartition spreads DOCS uniformly, but one mega-document still
# lands on a single task. Above `chunk_threshold` spans, a document is
# split at span boundaries; the CPU-heavy route phase (clean/recognize/
# boilerplate — ~90% of kernel time) runs per chunk in parallel, and the
# cheap doc-global finalize (footer-repeat strip, stub merge, dedup,
# ordering, offsets) reassembles per doc. Shares the exact kernel code
# with the single-pass path, so outputs are identical (tests pin this).
# ---------------------------------------------------------------------------

BLOCK_DDL = ("kind string, page int, y double, x double, text string, "
             "media_ref string, src_offset int, src_kind string, seq long, "
             "w double, h double")
_ROUTED_SCHEMA = f"doc_id string, blocks array<struct<{BLOCK_DDL}>>"
_CHUNK_PARTITION_OFFSET = 1_000_000


def _route_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        refs: set[str] = set()
        for spans in pdf["spans"]:
            if spans is None:
                continue
            for s in spans:
                if s["media_ref"]:
                    refs.add(s["media_ref"])
        ref_list = sorted(refs)
        media_text = dict(zip(ref_list, kernels.recognize_batch(ref_list)))

        ids, blocks_col = [], []
        for doc_id, base_seq, spans in zip(pdf["doc_id"], pdf["base_seq"], pdf["spans"]):
            blocks = kernels.route_spans(spans, media_text, int(base_seq))
            ids.append(doc_id)
            blocks_col.append([kernels.block_to_tuple(b) for b in blocks])
        yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="object"),
                            "blocks": pd.Series(blocks_col, dtype="object")})


def _finalize_group(pdf: pd.DataFrame) -> pd.DataFrame:
    doc_id = pdf["doc_id"].iloc[0]
    blocks: list = []
    for chunk in pdf["blocks"]:
        if chunk is not None:
            blocks.extend(kernels.block_from_dict(b) for b in chunk)
    blocks.sort(key=lambda b: b.seq)  # restore the single-pass routing order
    tuples = kernels.finalize_blocks(blocks)
    if not tuples:
        return pd.DataFrame({"doc_id": pd.Series([doc_id], dtype="object"),
                             "spans": pd.Series([None], dtype="object"),
                             "checksum": pd.Series([None], dtype="object")})
    chk = kernels.doc_checksum(doc_id, tuples)
    return pd.DataFrame({"doc_id": pd.Series([doc_id], dtype="object"),
                         "spans": pd.Series([tuples], dtype="object"),
                         "checksum": pd.Series([format(chk, '016x')], dtype="object")})


def extract_spans_chunked(fat_docs: DataFrame, chunk_threshold: int) -> DataFrame:
    """(doc_id, spans) of oversized docs -> unified rows via the
    chunked two-phase plan: explode to span-chunks (pure JVM slice) ->
    route per chunk (mapInPandas) -> groupBy(doc_id) finalize
    (applyInPandas). Lineage rows come from the finalize stage with
    partition ids offset to stay disjoint from the single-pass path."""
    n_chunks = F.ceil(F.size("spans") / F.lit(chunk_threshold)).cast("int")
    chunks = (fat_docs
              .select("doc_id",
                      F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
                      F.col("spans"))
              .select("doc_id",
                      (F.col("chunk_id").cast("long") * chunk_threshold).alias("base_seq"),
                      F.slice("spans", F.col("chunk_id") * chunk_threshold + 1,
                              F.lit(chunk_threshold)).alias("spans")))
    routed = chunks.mapInPandas(_route_chunks, schema=_ROUTED_SCHEMA)
    finalized = routed.groupBy("doc_id").applyInPandas(
        _finalize_group, schema="doc_id string, spans array<struct<kind string, "
                                "text string, media_ref string, offset int>>, "
                                "checksum string")

    def to_unified(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = (ctx.partitionId() if ctx is not None else 0) + _CHUNK_PARTITION_OFFSET
        t0 = time.monotonic()
        docs_in = docs_out = 0
        acc = 0
        for pdf in batches:
            rts, ids, spans_col = [], [], []
            for doc_id, spans, chk in zip(pdf["doc_id"], pdf["spans"], pdf["checksum"]):
                docs_in += 1
                ids.append(doc_id)
                if spans is None:
                    rts.append("quarantine")
                    spans_col.append(None)
                else:
                    docs_out += 1
                    acc = (acc + int(chk, 16)) % kernels._CHECK_MOD
                    rts.append("doc")
                    spans_col.append(spans)
            n = len(ids)
            yield pd.DataFrame({
                "row_type": pd.Series(rts, dtype="object"),
                "doc_id": pd.Series(ids, dtype="object"),
                "spans": pd.Series(spans_col, dtype="object"),
                "partition_id": pd.array([None] * n, dtype="Int32"),
                "docs_in": pd.array([None] * n, dtype="Int64"),
                "docs_out": pd.array([None] * n, dtype="Int64"),
                "checksum": pd.Series([None] * n, dtype="object"),
                "wall_ms": pd.array([None] * n, dtype="Int64"),
            })
        yield pd.DataFrame({
            "row_type": pd.Series(["lineage"], dtype="object"),
            "doc_id": pd.Series([None], dtype="object"),
            "spans": pd.Series([None], dtype="object"),
            "partition_id": pd.array([pid], dtype="Int32"),
            "docs_in": pd.array([docs_in], dtype="Int64"),
            "docs_out": pd.array([docs_out], dtype="Int64"),
            "checksum": pd.Series([format(acc, "016x")], dtype="object"),
            "wall_ms": pd.array([int((time.monotonic() - t0) * 1000)], dtype="Int64"),
        })

    return finalized.mapInPandas(to_unified, schema=UNIFIED_SCHEMA)


def extract_spans_auto(docs: DataFrame, num_partitions: int | None = None,
                       salt: int = DEFAULT_SALT,
                       chunk_threshold: int = 4096) -> DataFrame:
    """Skew-complete extraction: normal docs through the single-pass
    salted-repartition plan, oversized docs (> chunk_threshold spans)
    through the chunked two-phase plan; one unified output."""
    sized = docs.withColumn("_n", F.size("spans"))
    small = sized.filter(F.col("_n") <= chunk_threshold).drop("_n")
    fat = sized.filter(F.col("_n") > chunk_threshold).drop("_n")
    return extract_spans(small, num_partitions, salt).unionByName(
        extract_spans_chunked(fat, chunk_threshold))


def split_unified(unified: DataFrame) -> tuple[DataFrame, DataFrame]:
    spans = (unified.filter(F.col("row_type") == "doc")
             .select("doc_id", "spans"))
    lineage = (unified.filter(F.col("row_type") == "lineage")
               .select("partition_id", "docs_in", "docs_out", "checksum", "wall_ms"))
    return spans, lineage


def run_job(spark: SparkSession, docs: DataFrame, out_root: str,
            resume: bool = True, num_partitions: int | None = None,
            chunk_threshold: int | None = None) -> dict:
    """Execute the extraction with snapshot commit + idempotent resume.

    One full pass: the unified (docs + lineage) output is written to a
    staging dir and atomically committed; a rerun anti-joins the input
    against already-committed doc_ids, so a killed run resumes from the
    last commit and converges to the identical table (FIXTURES.md §3).

    `out_root` may be a directory (parquet-snapshot fallback) or an
    Iceberg ``catalog.db.table`` identifier — open_table routes; both
    backends satisfy the same contract (tests/test_catalog_contract)."""
    table = open_table(spark, out_root)
    if resume:
        done = table.committed_doc_ids(spark)
        if done is not None:
            docs = docs.join(done, "doc_id", "left_anti")

    snap_id, staging = table.begin()
    if chunk_threshold:
        unified = extract_spans_auto(docs, num_partitions=num_partitions,
                                     chunk_threshold=chunk_threshold)
    else:
        unified = extract_spans(docs, num_partitions=num_partitions)
    try:
        unified.write.mode("overwrite").parquet(staging)
    except Exception:
        table.abort(staging)
        raise
    table.commit(snap_id, staging, meta={"kind": "extract"})

    lineage = (table.read_snapshot(spark, snap_id)
               .filter(F.col("row_type") == "lineage"))
    stats = (lineage.agg(F.sum("docs_in").alias("docs_in"),
                         F.sum("docs_out").alias("docs_out"),
                         F.count("*").alias("partitions"))
             .collect()[0])
    checks = [int(r["checksum"], 16) for r in lineage.select("checksum").collect()]
    return {
        "snapshot": snap_id,
        "docs_in": stats["docs_in"] or 0,
        "docs_out": stats["docs_out"] or 0,
        "partitions": stats["partitions"],
        "checksum": kernels.combine_checksums(checks),
    }


def read_extracted(spark: SparkSession, out_root: str) -> DataFrame:
    """All committed extracted spans (union of snapshots)."""
    table = open_table(spark, out_root)
    df = table.read(spark)
    if df is None:
        return spark.createDataFrame([], DOCS_SCHEMA)
    return split_unified(df)[0]


def read_lineage(spark: SparkSession, out_root: str) -> DataFrame:
    table = open_table(spark, out_root)
    df = table.read(spark)
    if df is None:
        raise FileNotFoundError(f"no committed snapshots under {out_root}")
    return split_unified(df)[1]


def write_media_store(spark: SparkSession, docs: DataFrame, out_dir: str) -> int:
    """S10 figure-file sink analog: materialize every distinct media_ref
    payload into a binary side table (media_ref, payload, byte_len).
    Spans keep carrying only the ref — binary never rides a shuffle with
    document rows (SURVEY §1.3). Returns the number of refs written."""
    from pyspark.sql import types as T

    refs = (docs.select(F.explode("spans").alias("s"))
            .select(F.col("s.media_ref").alias("media_ref"))
            .filter(F.col("media_ref") != "")
            .distinct())

    @F.pandas_udf(T.BinaryType())
    def decode(refs_s: pd.Series) -> pd.Series:
        return pd.Series(
            [kernels.recognize_one(r).encode("utf-8") for r in refs_s],
            index=refs_s.index)

    out = refs.select("media_ref", decode(F.col("media_ref")).alias("payload"))               .withColumn("byte_len", F.length("payload"))
    out.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir).count()


def inject_manual_regions(docs: DataFrame, regions: DataFrame) -> DataFrame:
    """Manual-correction regions as a broadcast side-table (reference
    `process_pdf_with_corrections` + `_merge_manual_regions`,
    src/pipeline.py:4277-4396, 3696-3711; SURVEY §3.2: "the only
    broadcast join in the system"). `regions` columns: doc_id, kind,
    text, media_ref, page, y, x. Regions become extra spans appended
    after the document's own (offset-shifted), all JVM-side."""
    from pyspark.sql import Window as W

    # Total order (same hazard as inject_external_detections): two
    # corrections anchored at one (page, y, x) must not race for offsets.
    w = W.partitionBy("doc_id").orderBy(
        "page", "y", "x", "kind", "text", "media_ref")
    spans = regions.select(
        "doc_id",
        F.struct(
            F.col("kind").alias("kind"),
            # %.1f, NOT format_number: grouping separators ("1,000.0")
            # would break POS_HEADER_RE for coordinates >= 1000
            F.format_string("p=%d;y=%.1f;x=%.1f|%s",
                            F.col("page"),
                            F.col("y").cast("double"),
                            F.col("x").cast("double"),
                            F.col("text")).alias("text"),
            F.col("media_ref").alias("media_ref"),
            (F.lit(1_000_000) + F.row_number().over(w)).alias("offset"),
        ).alias("span"))
    extra = spans.groupBy("doc_id").agg(F.collect_list("span").alias("extra"))
    return (docs.join(F.broadcast(extra), "doc_id", "left")
            .select("doc_id",
                    F.when(F.col("extra").isNotNull(),
                           F.concat(F.col("spans"), F.col("extra")))
                    .otherwise(F.col("spans")).alias("spans")))


DETECTION_OFFSET_BASE = 2_000_000   # distinct from manual regions' 1M block
DETECTION_MIN_CONF = 0.5


def inject_external_detections(docs: DataFrame, dets: DataFrame,
                               min_conf: float = DETECTION_MIN_CONF) -> DataFrame:
    """M1/M2 closure without weights: a neural layout detector runs as
    a SEPARATE batch job (YOLO / Docling layout model; reference
    src/layout_detector.py:228-288, src/docling_backend.py:65-187) and
    lands its output in a detections side table
    ``(doc_id, page, x, y, w, h, cls, conf, media_ref)`` — bbox, class
    and confidence per region, plus the region-crop media ref its
    re-OCR consumes. This operator merges that table into the span
    stream, after which the UNCHANGED J1/J2/P9/M4 kernels decide
    override-vs-merge exactly as they do for native structure:

    * conf < min_conf          -> gated out (detector score threshold)
    * cls=table/figure rect    -> suppresses text blocks whose center
                                  falls inside it (J1), markers exempt
    * undersized figure bbox   -> P9 validity drop
    * crop segments form a grid-> M4 figure->table reclassify
    * elsewhere                -> appended as a new structure block

    UNLIKE inject_manual_regions (a bounded human-corrections table,
    the one legitimate broadcast in the system), the detections table
    is ~rows-per-page and therefore SCALES WITH THE CORPUS — so this
    join carries no broadcast hint: AQE broadcasts it at small SF and
    falls back to a shuffle join at 10^12 docs (repo rule: no
    F.broadcast on any table that scales with SF). Offsets land in the
    2M namespace ordered by the TOTAL key
    (page, y, x, w, h, cls, media_ref) — the same tuple
    synth.apply_detections_seq sorts by — so two detections sharing a
    bbox origin (same anchor, different class: routine in real
    detector output) still get deterministic offsets, and the span
    order / snapshot checksum are run-independent. Zero-area
    detections (w or h <= 0) are gated out with the confidence
    filter: a degenerate bbox has nothing to suppress, reclassify, or
    validity-check."""
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(
        "page", "y", "x", "w", "h", "cls", "media_ref")
    spans = dets.filter((F.col("conf") >= min_conf)
                        & (F.col("w") > 0) & (F.col("h") > 0)).select(
        "doc_id",
        F.struct(
            F.col("cls").alias("kind"),
            F.format_string("p=%d;y=%.1f;x=%.1f;w=%.1f;h=%.1f|",
                            F.col("page"),
                            F.col("y").cast("double"), F.col("x").cast("double"),
                            F.col("w").cast("double"), F.col("h").cast("double"))
            .alias("text"),
            F.col("media_ref").alias("media_ref"),
            (F.lit(DETECTION_OFFSET_BASE) + F.row_number().over(w)).alias("offset"),
        ).alias("span"))
    extra = spans.groupBy("doc_id").agg(F.collect_list("span").alias("extra"))
    return (docs.join(extra, "doc_id", "left")   # AQE decides; see docstring
            .select("doc_id",
                    F.when(F.col("extra").isNotNull(),
                           F.concat(F.col("spans"), F.col("extra")))
                    .otherwise(F.col("spans")).alias("spans")))


def docs_df_from_corpus(spark: SparkSession, corpus: list[tuple[str, list[dict]]]) -> DataFrame:
    rows = [(doc_id, [
        {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"],
         "offset": int(s["offset"])} for s in spans
    ]) for doc_id, spans in corpus]
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def interleaved_docs_from_flat(documents: DataFrame) -> DataFrame:
    """Derive the input_hint-shaped corpus from the driver's flat
    ``documents`` table (doc_id:int, text:string) — deterministic synth
    inside mapInPandas, no external data (synth.spans_from_flat_doc)."""
    from . import synth

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, spans_col = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ids.append(f"doc-{int(doc_id):08d}")
                spans_col.append(synth.spans_from_flat_doc(int(doc_id), text))
            yield pd.DataFrame({"doc_id": ids, "spans": spans_col})

    return documents.select("doc_id", "text").mapInPandas(gen, schema=DOCS_SCHEMA)
