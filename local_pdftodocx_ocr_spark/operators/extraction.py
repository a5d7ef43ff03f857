"""Extraction-pipeline queries for the driver contract.

The correctness trick: the driver compares each Spark query against a
DuckDB oracle SQL string. The extraction pipeline is not SQL-expressible,
but its expected output IS enumerable — the sequential oracle (the same
kernels, run on the driver) is serialized into an inline ``VALUES``
table, so the driver's hash comparison becomes a genuine distributed-vs-
sequential span-sequence-equality check (FIXTURES.md §2) executed by the
driver's own harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import job, kernels, oracle, synth
from .. import seq_oracles as _seq
from ..functions.text import (
    clean_text_udf,
    recognize_udf,
    strip_boilerplate_udf,
)

GOLDEN_N_DOCS = 48
_CHECK_MOD = (1 << 61) - 1


def _golden_corpus():
    return synth.gen_corpus(GOLDEN_N_DOCS)


def explode_spans(docs: DataFrame) -> DataFrame:
    return (docs.select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id", F.col("s.kind").alias("kind"),
                    F.col("s.text").alias("text"),
                    F.col("s.media_ref").alias("media_ref"),
                    F.col("s.offset").alias("offset")))


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values_sql(rows: list[tuple], columns: list[str], int_cols: set[str]) -> str:
    def lit(v, col):
        if col in int_cols:
            return str(int(v))
        return _sql_quote(str(v))

    body = ",\n".join(
        "(" + ", ".join(lit(v, c) for v, c in zip(row, columns)) + ")"
        for row in rows
    )
    cols = ", ".join(f'"{c}"' for c in columns)
    casts = ", ".join(
        f'CAST("{c}" AS INTEGER) AS "{c}"' if c in int_cols else f'"{c}"'
        for c in columns
    )
    return f"SELECT {casts} FROM (VALUES\n{body}\n) AS t({cols})"


# ---------------------------------------------------------------------------
# Golden pipeline equality (the flagship correctness gate)
# ---------------------------------------------------------------------------

def extract_spans_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed extraction of the fixed synthetic golden corpus,
    exploded to flat span rows. sf_dir is unused: the corpus is the
    deterministic FIXTURES.md fixture set (no external data)."""
    corpus = _golden_corpus()
    docs = job.docs_df_from_corpus(spark, corpus)
    unified = job.extract_spans(docs, num_partitions=4)
    spans = job.split_unified(unified)[0]
    return explode_spans(spans)


def extract_spans_golden_oracle_sql() -> str:
    rows = oracle.flat_rows(_golden_corpus())
    return _values_sql(rows, ["doc_id", "kind", "text", "media_ref", "offset"],
                       int_cols={"offset"})


# ---------------------------------------------------------------------------
# Lineage totals (global invariants, partitioning-independent)
# ---------------------------------------------------------------------------

def extract_lineage_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _golden_corpus()
    docs = job.docs_df_from_corpus(spark, corpus)
    unified = job.extract_spans(docs, num_partitions=4)
    lineage = job.split_unified(unified)[1]
    check_sum = F.sum(F.conv(F.col("checksum"), 16, 10).cast("decimal(38,0)"))
    mod = check_sum % F.lit(_CHECK_MOD).cast("decimal(38,0)")
    return lineage.agg(
        F.sum("docs_in").alias("docs_in"),
        F.sum("docs_out").alias("docs_out"),
        F.lpad(F.lower(F.conv(mod.cast("long"), 10, 16)), 16, "0").alias("checksum"),
    )


def extract_lineage_totals_oracle_sql() -> str:
    exp = oracle.expected_lineage_totals(_golden_corpus())
    return (f"SELECT CAST({exp['docs_in']} AS BIGINT) AS docs_in, "
            f"CAST({exp['docs_out']} AS BIGINT) AS docs_out, "
            f"{_sql_quote(exp['checksum'])} AS checksum")


# ---------------------------------------------------------------------------
# Focused operator queries (one kernel each, via the vectorized UDFs)
# ---------------------------------------------------------------------------

_CLEAN_FIXTURES = [
    "a\x00b​c",
    "๑๒๓ เเมว นํา",
    "ภาษา ไทย กับ   spaces",
    "real text\n~~~~\n|||\nmore",
    "a   b\n\n\n\nc",
    "2.1 Section   header",
    "กั้น ก้้ ซ้ำ",
    "mixed ไทย and english ๕๕",
]

_HTML_FIXTURES = [
    "<nav><a href='/'>home</a></nav><p>the long main content paragraph body</p>"
    "<footer>copyright</footer>",
    "<p>first long paragraph with plenty of real content here</p><p>short bridge</p>"
    "<p>second long paragraph with plenty of real content too</p>",
    "<p><a href='a'>aaaaaaaaaaaaaaaa</a> <a href='b'>bbbbbbbbbbbbbbbb</a></p>"
    "<p>genuine article text that should be kept by the scorer</p>",
    "<div>standalone div content long enough to pass the length gate</div>",
    "just bare text without any tags at all but long enough to keep",
]

_RECOGNIZE_FIXTURES = [
    kernels.encode_media("recovered text one"),
    kernels.encode_media("ภาษาไทย ๑๒๓"),
    kernels.encode_media(""),
    "s3://not-a-mem-ref",
    "",
]


def _fixture_df(spark: SparkSession, values: list[str]) -> DataFrame:
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, raw string")


def extract_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_fixture_df(spark, _CLEAN_FIXTURES)
            .select("id", clean_text_udf(F.col("raw")).alias("cleaned")))


def extract_clean_text_oracle_sql() -> str:
    rows = [(i, kernels.clean_text(v)) for i, v in enumerate(_CLEAN_FIXTURES)]
    return _values_sql(rows, ["id", "cleaned"], int_cols={"id"})


def extract_boilerplate_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_fixture_df(spark, _HTML_FIXTURES)
            .select("id", strip_boilerplate_udf(F.col("raw")).alias("content")))


def extract_boilerplate_html_oracle_sql() -> str:
    rows = [(i, kernels.strip_boilerplate_html(v)) for i, v in enumerate(_HTML_FIXTURES)]
    return _values_sql(rows, ["id", "content"], int_cols={"id"})


def extract_recognize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_fixture_df(spark, _RECOGNIZE_FIXTURES)
            .select("id", recognize_udf(F.col("raw")).alias("recognized")))


def extract_recognize_media_oracle_sql() -> str:
    rows = [(i, kernels.recognize_one(v)) for i, v in enumerate(_RECOGNIZE_FIXTURES)]
    return _values_sql(rows, ["id", "recognized"], int_cols={"id"})


# ---------------------------------------------------------------------------
# Per-page content stats (A1 analog: reference `_page_content_chars` /
# `_page_text_block_count`, src/pipeline.py:589-626) over the raw input
# spans — page parsed from the position header, all JVM-side.
# ---------------------------------------------------------------------------

def extract_page_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _golden_corpus()
    docs = job.docs_df_from_corpus(spark, corpus)
    s = F.col("s")
    body_len = F.length(F.regexp_replace(s["text"], r"^p=\d+;y=[0-9.]+;x=[0-9.]+(;w=[0-9.]+;h=[0-9.]+)?\|", ""))
    page = F.regexp_extract(s["text"], r"^p=(\d+);", 1).cast("int")
    return (docs.select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id", page.alias("page"), body_len.alias("chars"))
            .groupBy("doc_id", "page")
            .agg(F.count("*").alias("n_spans"),
                 F.sum("chars").alias("n_chars")))


def extract_page_stats_oracle_sql() -> str:
    agg: dict[tuple, list[int]] = {}
    for doc_id, spans in _golden_corpus():
        for sp in spans:
            page, _, _, _, _, body = kernels.parse_pos_header(sp["text"])
            k = (doc_id, page)
            cur = agg.setdefault(k, [0, 0])
            cur[0] += 1
            cur[1] += len(body)
    rows = [(d, p, n, c) for (d, p), (n, c) in sorted(agg.items())]
    sql = _values_sql(rows, ["doc_id", "page", "n_spans", "n_chars"],
                      int_cols={"page"})
    # n_spans / n_chars are BIGINT on the Spark side (count/sum)
    return sql.replace('"n_spans"', 'CAST("n_spans" AS BIGINT) AS "n_spans"', 1) \
              .replace('"n_chars"', 'CAST("n_chars" AS BIGINT) AS "n_chars"', 1)


# ---------------------------------------------------------------------------
# TXT sink render (S7 analog: reference `_blocks_to_txt`,
# src/exporter.py:1536-1569): ordered span texts joined per document —
# computed entirely JVM-side from the spans array.
# ---------------------------------------------------------------------------

def extract_txt_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _golden_corpus()
    docs = job.docs_df_from_corpus(spark, corpus)
    unified = job.extract_spans(docs, num_partitions=4)
    spans = job.split_unified(unified)[0]
    ordered = F.array_sort(
        F.transform(F.col("spans"),
                    lambda s: F.struct(s["offset"].alias("o"), s["text"].alias("t"))))
    return spans.select(
        "doc_id",
        F.array_join(F.transform(ordered, lambda s: s["t"]), "\n").alias("txt"))


def extract_txt_render_oracle_sql() -> str:
    rows = []
    for doc_id, spans in _golden_corpus():
        tuples = kernels.extract_document(doc_id, spans)
        if tuples:
            rows.append((doc_id, "\n".join(t for (_, t, _, _) in tuples)))
    return _values_sql(rows, ["doc_id", "txt"], int_cols=set())


# ---------------------------------------------------------------------------
# HTML sink render (S8 analog: reference `_build_html`,
# src/exporter.py:505-519): ordered spans -> flow HTML per document.
# Pure JVM expressions; the escape chain is mirrored exactly in SQL.
# ---------------------------------------------------------------------------

def _html_escape(col):
    return F.replace(F.replace(F.replace(col, F.lit("&"), F.lit("&amp;")),
                               F.lit("<"), F.lit("&lt;")),
                     F.lit(">"), F.lit("&gt;"))


def extract_html_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _golden_corpus()
    docs = job.docs_df_from_corpus(spark, corpus)
    unified = job.extract_spans(docs, num_partitions=4)
    spans = job.split_unified(unified)[0]
    ordered = F.array_sort(
        F.transform(F.col("spans"),
                    lambda sp: F.struct(sp["offset"].alias("o"),
                                        sp["kind"].alias("k"),
                                        sp["text"].alias("t"))))
    frag = lambda sp: (
        F.when(sp["k"] == "table",
               F.concat(F.lit("<table>"), _html_escape(sp["t"]), F.lit("</table>")))
        .when(sp["k"] == "figure",
              F.concat(F.lit("<figure>"), _html_escape(sp["t"]), F.lit("</figure>")))
        .otherwise(F.concat(F.lit("<p>"), _html_escape(sp["t"]), F.lit("</p>"))))
    return spans.select(
        "doc_id",
        F.concat(F.lit("<article>"),
                 F.array_join(F.transform(ordered, frag), ""),
                 F.lit("</article>")).alias("html"))


def _py_html_escape(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def extract_html_render_oracle_sql() -> str:
    rows = []
    for doc_id, spans in _golden_corpus():
        tuples = kernels.extract_document(doc_id, spans)
        if not tuples:
            continue
        frags = []
        for k, t, _, _ in tuples:
            tag = {"table": "table", "figure": "figure"}.get(k, "p")
            frags.append(f"<{tag}>{_py_html_escape(t)}</{tag}>")
        rows.append((doc_id, "<article>" + "".join(frags) + "</article>"))
    return _values_sql(rows, ["doc_id", "html"], int_cols=set())


# ---------------------------------------------------------------------------
# Focused operator-family queries (round 2): grid tables (M8/M9),
# segment->line clustering (W3), marker band recovery (M11), weak-primary
# complementary merge (J2). Each runs the full distributed pipeline over
# a dedicated fixture corpus and is checked against the sequential
# kernel oracle inlined as VALUES — distributed-vs-sequential equality.
# ---------------------------------------------------------------------------

_FLAT_COLS = ["doc_id", "kind", "text", "media_ref", "offset"]


def _kind_query(name: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        corpus = synth.gen_kind_corpus(name)
        docs = job.docs_df_from_corpus(spark, corpus)
        unified = job.extract_spans(docs, num_partitions=4)
        return explode_spans(job.split_unified(unified)[0])
    q.__name__ = f"extract_{name}_query"
    return q


def _kind_oracle_sql(name: str) -> str:
    rows = oracle.flat_rows(synth.gen_kind_corpus(name))
    return _values_sql(rows, _FLAT_COLS, int_cols={"offset"})


extract_table_grid = _kind_query("grid")
extract_segments_to_lines = _kind_query("segments")
extract_marker_recovery = _kind_query("band")
extract_complementary_merge = _kind_query("weak")
extract_page_segmentation = _kind_query("page")


_DETS_SCHEMA = ("doc_id string, page int, x double, y double, w double, "
                "h double, cls string, conf double, media_ref string")


def extract_external_detections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2 seam closure: merge an external layout-detections side
    table (class + confidence + bbox + crop ref, the shape a YOLO/
    Docling batch job emits) into the span stream via a broadcast join,
    then run the UNCHANGED extraction kernels — J1 suppression under
    high-conf structure (override), P9/confidence gating, M4 crop-grid
    reclassify, plain append elsewhere (merge). Checked against the
    sequential oracle with oracle-side injection."""
    corpus, dets = synth.gen_detections_corpus()
    docs = job.docs_df_from_corpus(spark, corpus)
    dets_df = spark.createDataFrame(dets, _DETS_SCHEMA)
    injected = job.inject_external_detections(docs, dets_df)
    unified = job.extract_spans(injected, num_partitions=4)
    return explode_spans(job.split_unified(unified)[0])


def extract_external_detections_oracle_sql() -> str:
    corpus, dets = synth.gen_detections_corpus()
    rows = oracle.flat_rows(synth.apply_detections_seq(corpus, dets))
    return _values_sql(rows, _FLAT_COLS, int_cols={"offset"})


# ---------------------------------------------------------------------------
# At-scale pipeline over the driver's documents table (VALUES oracle from
# the sequential kernels; also the entry()/bench flagship)
# ---------------------------------------------------------------------------

def extract_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = job.interleaved_docs_from_flat(flat)
    unified = job.extract_spans(docs)
    return explode_spans(job.split_unified(unified)[0])


def curate_spans(spans: DataFrame, min_tokens: int = 30) -> DataFrame:
    """Post-extraction curation: render spans to text (offset order) ->
    token gate (>= min_tokens) -> exact dedup (first-wins by doc_id per
    rendered text) -> deterministic 80/10/10 split. Returns
    (doc_id, text, n_tokens, split). Every stage is integer/string
    logic — no RNG, no floats — so reruns and the sequential oracle
    agree bit-for-bit. Reachable from the CLI via ``--curate``."""
    ordered = F.array_sort(
        F.transform(F.col("spans"),
                    lambda s: F.struct(s["offset"].alias("o"), s["text"].alias("t"))))
    txt = F.array_join(F.transform(ordered, lambda s: s["t"]), "\n")
    toks = F.size(F.filter(F.split(txt, "[ \n]"), lambda x: x != F.lit("")))
    base = (spans.select("doc_id", txt.alias("text"), toks.alias("n_tokens"))
            .filter(F.col("n_tokens") >= min_tokens))
    keep = (base.groupBy("text")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.min("n_tokens").alias("n_tokens")))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id")), 1, 8), 16, 10).cast("long"),
        F.lit(100))
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "valid")
             .otherwise("test"))
    return keep.select("doc_id", "text", "n_tokens", split.alias("split"))


def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE composed training-data pipeline, end to end: interleave ->
    distributed extraction -> render text -> token gate (>=30) -> exact
    dedup (min doc_id per rendered text) -> deterministic 80/10/10
    split. Every stage is integer/string logic, so the sequential
    kernel oracle mirrors it bit-for-bit (seq_oracles)."""
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = job.interleaved_docs_from_flat(flat)
    spans = job.split_unified(job.extract_spans(docs))[0]
    return curate_spans(spans).select("doc_id", "n_tokens", "split")


def pipeline_training_corpus_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL modern training-corpus composition (VERDICT r5 #3) — the
    FineWeb/CCNet-shaped end-to-end a real user runs first: interleave
    -> distributed extraction -> render -> token gate (>=30) -> exact
    dedup on rendered text -> QUALITY FILTER CHAIN (length/stopword/
    token-length gates, textstats.quality_filter_chain) -> UNIFIED
    near-dup keep list (a doc survives iff it is the quality-canonical
    member of its any-signal cluster, dedup.dedup_canonical_keep) ->
    PERPLEXITY-BUCKET gate (CCNet: keep head+middle tertiles, drop
    tail; docs with no scoreable bigram are dropped as unscorable) ->
    deterministic 80/10/10 split. The three inserted gates run over the
    raw documents table (their registered per-stage semantics) and
    compose by doc id; each join is a semi-join on an id column, so no
    stage widens rows or reshuffles the corpus more than its registered
    form already does. Oracle: the per-stage oracles chained verbatim
    (the sequential-kernel VALUES base + the three stage SQLs), so the
    composed result is pinned by exactly the logic that pins each
    stage."""
    from .dedup import dedup_canonical_keep
    from .textstats import perplexity_buckets, quality_filter_chain

    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = job.interleaved_docs_from_flat(flat)
    spans = job.split_unified(job.extract_spans(docs))[0]
    # numeric id: curate_spans keys rows by the interleaved "doc-%08d"
    # string; the stage gates key by the raw BIGINT doc_id
    base = curate_spans(spans).withColumn(
        "nid", F.substring("doc_id", 5, 16).cast("long"))
    qf = quality_filter_chain(spark, sf_dir).select(F.col("doc_id").alias("nid"))
    keep = dedup_canonical_keep(spark, sf_dir).select(F.col("keep_id").alias("nid"))
    ppl = (perplexity_buckets(spark, sf_dir)
           .filter(F.col("bucket") != "tail")
           .select(F.col("doc_id").alias("nid")))
    return (base.join(qf, "nid", "left_semi")
            .join(keep, "nid", "left_semi")
            .join(ppl, "nid", "left_semi")
            .select("doc_id", "n_tokens", "split"))


def training_corpus_full_oracle_sql() -> str:
    """Chained per-stage oracles: the sequential-kernel VALUES base
    (extract/render/token-gate/exact-dedup) joined to the quality-
    filter SQL, the canonical-keep SQL (itself the recursive-CTE
    unified-components oracle), and the perplexity-buckets SQL — one
    source of truth per stage, so this oracle drifts with the stage
    oracles instead of silently diverging."""
    from .dedup import canonical_keep_sql
    from .textstats import PPL_BUCKETS_SQL, QUALITY_FILTER_SQL

    return f"""
WITH base AS ({_seq.training_corpus_values_sql()}),
qf AS (SELECT doc_id FROM ({QUALITY_FILTER_SQL})),
keep AS (SELECT keep_id AS doc_id FROM ({canonical_keep_sql()})),
ppl AS (SELECT doc_id FROM ({PPL_BUCKETS_SQL}) WHERE bucket <> 'tail')
SELECT b.doc_id, b.n_tokens, b.split
FROM base b
JOIN qf   ON qf.doc_id   = CAST(substr(b.doc_id, 5) AS BIGINT)
JOIN keep ON keep.doc_id = CAST(substr(b.doc_id, 5) AS BIGINT)
JOIN ppl  ON ppl.doc_id  = CAST(substr(b.doc_id, 5) AS BIGINT)
"""


QUERIES = {
    "extract_spans_golden": extract_spans_golden,
    "pipeline_training_corpus": pipeline_training_corpus,
    "pipeline_training_corpus_full": pipeline_training_corpus_full,
    "extract_table_grid": extract_table_grid,
    "extract_segments_to_lines": extract_segments_to_lines,
    "extract_marker_recovery": extract_marker_recovery,
    "extract_complementary_merge": extract_complementary_merge,
    "extract_page_segmentation": extract_page_segmentation,
    "extract_external_detections": extract_external_detections,
    "extract_lineage_totals": extract_lineage_totals,
    "extract_clean_text": extract_clean_text,
    "extract_boilerplate_html": extract_boilerplate_html,
    "extract_recognize_media": extract_recognize_media,
    "extract_txt_render": extract_txt_render,
    "extract_page_stats": extract_page_stats,
    "extract_html_render": extract_html_render,
    "extract_from_documents": extract_from_documents,
}


def oracles() -> dict[str, str]:
    return {
        "extract_spans_golden": extract_spans_golden_oracle_sql(),
        "pipeline_training_corpus": _seq.training_corpus_values_sql(),
        "pipeline_training_corpus_full": training_corpus_full_oracle_sql(),
        "extract_table_grid": _kind_oracle_sql("grid"),
        "extract_segments_to_lines": _kind_oracle_sql("segments"),
        "extract_marker_recovery": _kind_oracle_sql("band"),
        "extract_complementary_merge": _kind_oracle_sql("weak"),
        "extract_page_segmentation": _kind_oracle_sql("page"),
        "extract_external_detections": extract_external_detections_oracle_sql(),
        "extract_lineage_totals": extract_lineage_totals_oracle_sql(),
        "extract_clean_text": extract_clean_text_oracle_sql(),
        "extract_boilerplate_html": extract_boilerplate_html_oracle_sql(),
        "extract_recognize_media": extract_recognize_media_oracle_sql(),
        "extract_txt_render": extract_txt_render_oracle_sql(),
        "extract_page_stats": extract_page_stats_oracle_sql(),
        "extract_html_render": extract_html_render_oracle_sql(),
        # full pipeline over the driver's documents table, checked against
        # the sequential kernel oracle inlined as VALUES (seq_oracles)
        "extract_from_documents": _seq.extract_from_documents_values_sql(),
    }
