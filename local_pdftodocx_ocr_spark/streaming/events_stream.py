"""Structured Streaming analogs (SURVEY.md §2.11).

The north rule is a batch job (checkpoint resume covers incrementality),
but the engine ships the streaming shapes a live ingest would need:

* watermarked tumbling-window aggregation over the events stream
* streaming sessionization scaffold (session_window)

Both are driven in tests from a bounded file source with a memory sink
(`processAllAvailable`), which exercises the identical operator graph a
Kafka source would feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int = 1,
                       glob: str = "events.parquet") -> DataFrame:
    """File-source stream over the events parquet (the source must be a
    directory; pathGlobFilter selects the table file)."""
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("pathGlobFilter", glob)
            .parquet(sf_dir))


def windowed_counts(events: DataFrame, window: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts with late-data watermark."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .select(F.col("window.start").cast("string").alias("win_start"),
                    "event_type", "n", "sum_value"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "1 hour") -> DataFrame:
    """Session windows per user (gap-based), the streaming form of the
    batch sessionize_events operator."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("session_window.start").cast("string").alias("sess_start"),
                    "user_id", "n_events"))


def dedup_within_watermark(events: DataFrame,
                           watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup with BOUNDED state: emit each event_id's
    first arrival, expiring dedup state once the watermark passes it.
    This is the scale-correct form of streaming dedup for an unbounded
    feed — the applyInPandasWithState variant (extract_stream) holds a
    key forever, which is right for a finite doc corpus but not for an
    infinite event stream; here state size tracks the watermark delay,
    not the stream length."""
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def enrich_stream_static(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (bounded,
    slowly-changing) dimension — the standard enrichment shape. The dim
    re-reads per micro-batch, so a catalog-backed table picks up updates
    between batches; no broadcast hint (Spark chooses — the static side
    here is bounded by construction, so AQE broadcasts it anyway)."""
    return events.join(dim, "event_type", "left")


CMS_STREAM_D = 4
CMS_STREAM_W = 1024


def cms_cells_stream(events: DataFrame, d: int = CMS_STREAM_D,
                     w: int = CMS_STREAM_W) -> DataFrame:
    """Streaming count-min sketch over user_id — the CONSTANT-state
    stateful aggregation: however long the stream runs, the aggregation
    state is at most d*w = 4096 cells (each micro-batch's partial
    counts merge into the same bounded cell grid — complete/update
    output, no watermark needed because state cannot grow). The batch
    CMS (textstats.term_freq_cms) pre-aggregates term frequencies
    before hashing, a two-level aggregate streaming cannot chain; here
    each event hashes once on arrival — same md5 buckets, so the final
    cell grid is IDENTICAL to the batch formula over the same rows
    (pinned in tests)."""
    from ..functions.hashing import md5_60bit

    item = F.col("user_id").cast("string")
    buckets = F.array(*[
        F.pmod(md5_60bit(F.concat(item, F.lit(f"cms{i}"))), F.lit(w))
        for i in range(d)])
    cells = events.select(item.alias("item"),
                          F.posexplode(buckets).alias("i", "bucket"))
    return cells.groupBy("i", "bucket").agg(F.count("*").alias("c"))


HLL_STREAM_P = 8
HLL_STREAM_M = 1 << HLL_STREAM_P


def hll_registers_stream(events: DataFrame,
                         p: int = HLL_STREAM_P) -> DataFrame:
    """Streaming HyperLogLog register grid over user_id — the second
    CONSTANT-state stateful aggregation (with cms_cells_stream above):
    state is at most 2^p = 256 register rows however long the stream
    runs, because per-register MAX merges monotonically across
    micro-batches (complete/update output, no watermark needed — state
    cannot grow). Shares hll_bucket_rho with the batch sketch
    (textstats.hll_distinct_shingles), so the drained register table is
    IDENTICAL to the batch formula over the same rows (pinned in
    tests); distinct-count estimation is the bounded 256-row fold the
    batch operator applies."""
    from ..functions.hashing import hll_bucket_rho

    bucket, rho = hll_bucket_rho(F.col("user_id").cast("string"), p)
    return (events.select(bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("m")))


HIST_STREAM_BIN = 8.0         # value in [0, ~1000) -> <= 128 cells
HIST_STREAM_MAX_BIN = 127


def value_bin_col() -> "F.Column":
    """The histogram bin of `value` — ONE definition of the geometry,
    shared by this streaming grid and the batch per-group sketch
    (relational.events_value_quantile_sketch), so the streamed cells
    always feed the identical estimator. Clamps BOTH ends (a negative
    outlier would mint unbounded negative bins); callers must filter
    NULL values first (least/greatest skip nulls, so an unfiltered NULL
    would land in the top bin as a maximal outlier)."""
    return F.greatest(
        F.least(F.floor(F.col("value") / HIST_STREAM_BIN),
                F.lit(HIST_STREAM_MAX_BIN).cast("long")),
        F.lit(0).cast("long"))


def value_hist_stream(events: DataFrame) -> DataFrame:
    """Streaming histogram over event values — the third constant-state
    stateful aggregation (with the CMS cells and HLL registers above):
    state is at most 128 bin rows however long the stream runs, and the
    drained cell counts equal the batch formula over the same rows
    (pinned in tests). The sink-side reader turns the cells into
    quantile estimates exactly like the batch length-quantile sketch —
    streaming quantiles without ever holding the value stream."""
    return (events.filter(F.col("value").isNotNull())
            .select(value_bin_col().alias("bin"))
            .groupBy("bin").agg(F.count("*").alias("c")))


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded stream to completion into a memory sink; returns
    the query (stopped)."""
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).start())
    q.processAllAvailable()
    q.stop()
    return q
