"""Corpus-scale deduplication operators over the ``documents`` table.

The dedup ladder a training-data pipeline runs (SURVEY.md task brief):

* exact        — hash-groupBy (one shuffle on a 16-byte key)
* word-3-gram Jaccard — shingle inverted-index self-join (exact; SQL oracle)
* MinHash+LSH  — shingle -> minhash signature -> band -> bucket join
                 (the 100 TB path: candidate pairs only, no O(n²))
* SimHash      — 64-bit near-dup signature, hamming-bucket join
* embedding cosine near-dup — see similarity.py

Exact and Jaccard have DuckDB oracles. MinHash/SimHash use xxhash64
(JVM-side, no DuckDB equivalent) — they are rows-only checked by the
driver and property-tested against the exact-Jaccard oracle in pytest
(candidates ⊇ high-similarity pairs).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MINHASH_PERMS = 32          # minhash signature length
LSH_BANDS = 8               # 8 bands x 4 rows -> catches J >= ~0.6
LSH_ROWS = MINHASH_PERMS // LSH_BANDS
JACCARD_THRESHOLD = 0.6


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Exact dedup (normalized md5 groupBy)
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    key = F.md5(F.lower(F.col("text")))
    return (
        d.groupBy(key.alias("content_key"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


DEDUP_EXACT_SQL = """
SELECT md5(lower(text)) AS content_key,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Word-3-gram Jaccard pairwise dedup (exact; shingle inverted-index join)
# ---------------------------------------------------------------------------

def _shingle_array(col):
    """Distinct word-3-gram shingles, pure JVM expressions (1-based
    element_at, mirrored exactly by the DuckDB list formulation)."""
    toks = F.split(col, " ")
    n_sh = F.greatest(F.size(toks) - 2, F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1),
                              F.element_at(toks, i + 2)),
    )
    return F.array_distinct(shingles)


def _distinct_shingles(d: DataFrame) -> DataFrame:
    return (d.filter(F.size(F.split(F.col("text"), " ")) >= 3)
            .select("doc_id", F.explode(_shingle_array(F.col("text"))).alias("s")))


def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All doc pairs with word-3-gram-shingle Jaccard >= 0.6 (doc1 < doc2).

    Distributed shape: inverted index (shingle -> docs) self-join gives
    per-pair intersection counts in one shuffle keyed by shingle; per-doc
    set sizes broadcast back. Shingles (not unigrams) keep the index
    selective: only genuinely overlapping docs meet in a bucket. At
    100 TB the self-join is pre-filtered by the LSH candidates below;
    here it doubles as the exact oracle."""
    d = _docs(spark, sf_dir)
    toks = _distinct_shingles(d)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    t1 = toks.alias("t1")
    t2 = toks.alias("t2")
    inter = (
        t1.join(t2, (F.col("t1.s") == F.col("t2.s"))
                & (F.col("t1.doc_id") < F.col("t2.doc_id")))
        .groupBy(F.col("t1.doc_id").alias("doc1"), F.col("t2.doc_id").alias("doc2"))
        .agg(F.count("*").alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("sz").alias("sz2"))
    jac = F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter"))
    return (
        inter.join(F.broadcast(s1), "doc1").join(F.broadcast(s2), "doc2")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc1", "doc2", "jaccard")
    )


DEDUP_JACCARD_SQL = f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, GREATEST(len(string_split(text, ' ')) - 2, 0) + 1),
    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
         || ' ' || string_split(text, ' ')[i+2]
  ))) AS s
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc1, doc2,
       ROUND(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter), 4) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = doc1
JOIN sizes s2 ON s2.doc_id = doc2
WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH candidate generation (the at-scale path; JVM-side xxhash64)
# ---------------------------------------------------------------------------

def minhash_signatures(d: DataFrame) -> DataFrame:
    """32-perm minhash over distinct word-3-gram shingles, entirely
    with built-in expressions: perm_i(doc) = min over shingles of
    xxhash64(shingle, i). No Python, no UDF."""
    # Explode shingles once, then 32 min-aggregates in a single hash
    # aggregation (map-side partial agg; one shuffle on doc_id). The
    # array-expression form (32 x transform over a rebuilt shingle
    # array) blows up codegen and runs ~50x slower.
    sh = _distinct_shingles(d)
    aggs = [F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"m{i}")
            for i in range(MINHASH_PERMS)]
    wide = sh.groupBy("doc_id").agg(*aggs)
    sig = F.array(*[F.col(f"m{i}") for i in range(MINHASH_PERMS)])
    return wide.select("doc_id", sig.alias("sig"))


def dedup_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs sharing any (band_id, band-hash) bucket are
    candidate near-dups. One groupBy shuffle on the bucket key; output
    is the candidate pair set (doc1 < doc2), deduped across bands.

    At 10^12 docs: buckets are the shuffle key (uniform by hash), the
    exact-Jaccard verify join runs only on candidates."""
    d = _docs(spark, sf_dir)
    sigs = minhash_signatures(d)
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col("sig")[b * LSH_ROWS + r] for r in range(LSH_ROWS)]).alias("bh"),
        )
        for b in range(LSH_BANDS)
    ])
    exploded = sigs.select("doc_id", F.explode(bands).alias("bk"))
    buck = exploded.select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    b1 = buck.alias("b1")
    b2 = buck.alias("b2")
    return (
        b1.join(b2, (F.col("b1.band") == F.col("b2.band"))
                & (F.col("b1.bh") == F.col("b2.bh"))
                & (F.col("b1.doc_id") < F.col("b2.doc_id")))
        .select(F.col("b1.doc_id").alias("doc1"), F.col("b2.doc_id").alias("doc2"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) near-dup signatures — vectorized pandas UDF
# ---------------------------------------------------------------------------

def simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over unigram tokens. The bit-vote accumulation is
    numpy inside an Arrow-batched pandas UDF (64 bit-columns of JVM
    expressions would bloat codegen; this is the documented slow-path
    escape hatch). Deterministic: blake2b token hashes."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            votes = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for tok in set((t or "").split()):
                h = np.uint64(int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"))
                bits = (h >> shifts) & np.uint64(1)
                votes += np.where(bits == 1, 1, -1)
            v = 0
            for b in range(64):
                if votes[b] > 0:
                    v |= 1 << b
            out[i] = np.int64(v - (1 << 64) if v >= (1 << 63) else v)
        return pd.Series(out)

    d = _docs(spark, sf_dir)
    return d.select("doc_id", _simhash(F.col("text")).alias("simhash"))


def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized dedup decision: documents surviving near-dup
    removal (greedy: a doc is dropped iff it appears as the larger
    doc_id of a >=0.6-Jaccard pair — deterministic, order-free)."""
    d = _docs(spark, sf_dir)
    pairs = dedup_jaccard_pairs(spark, sf_dir)
    drops = pairs.select(F.col("doc2").alias("doc_id")).distinct()
    return d.join(drops, "doc_id", "left_anti").select("doc_id", "lang", "source")


DEDUP_KEEP_SQL = f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, GREATEST(len(string_split(text, ' ')) - 2, 0) + 1),
    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
         || ' ' || string_split(text, ' ')[i+2]
  ))) AS s
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
drops AS (
  SELECT DISTINCT doc2 AS doc_id
  FROM inter
  JOIN sizes s1 ON s1.doc_id = doc1
  JOIN sizes s2 ON s2.doc_id = doc2
  WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= {JACCARD_THRESHOLD}
)
SELECT doc_id, lang, source FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM drops)
"""


def dedup_pipeline_at_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed 100 TB dedup path: MinHash-LSH candidates (no O(n²))
    -> exact shingle-Jaccard verify ON CANDIDATES ONLY -> survivors.
    Rows-only driver check; pytest asserts it equals the exact keep
    list on this corpus (LSH recall property)."""
    d = _docs(spark, sf_dir)
    cand = dedup_minhash_candidates(spark, sf_dir)

    sh = _distinct_shingles(d)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # verify join restricted to candidate pairs
    s1 = sh.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1"))
    s2 = sh.select(F.col("doc_id").alias("_d2"), F.col("s").alias("s2"))
    inter = (cand.join(s1, "doc1")
             .join(s2, (F.col("doc2") == F.col("_d2"))
                   & (F.col("s1") == F.col("s2")))
             .groupBy("doc1", "doc2").agg(F.count("*").alias("inter")))
    z1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("sz").alias("sz1"))
    z2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("sz").alias("sz2"))
    jac = F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter"))
    dups = (inter.join(F.broadcast(z1), "doc1").join(F.broadcast(z2), "doc2")
            .filter(jac >= JACCARD_THRESHOLD)
            .select(F.col("doc2").alias("doc_id")).distinct())
    return d.join(dups, "doc_id", "left_anti").select("doc_id", "lang", "source")


QUERIES = {
    "docs_dedup_exact": dedup_exact,
    "docs_dedup_pipeline_at_scale": dedup_pipeline_at_scale,
    "docs_dedup_keep_list": dedup_keep_list,
    "docs_dedup_jaccard_pairs": dedup_jaccard_pairs,
    "docs_dedup_minhash_candidates": dedup_minhash_candidates,
    "docs_simhash64": simhash64,
}

ORACLES = {
    "docs_dedup_exact": DEDUP_EXACT_SQL,
    "docs_dedup_keep_list": DEDUP_KEEP_SQL,
    "docs_dedup_jaccard_pairs": DEDUP_JACCARD_SQL,
    # minhash/simhash: xxhash64/blake2b have no DuckDB equivalent ->
    # rows-only driver check; pytest property-tests candidates ⊇ oracle pairs.
}
