"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against its oracle_sql() via DuckDB — row count, column
names, NORMALIZED COLUMN TYPES, and order-insensitive value equality
(columns sorted by name, cells canonicalized to strings, rows sorted).

The type check exists because string-canonicalized values alone are
provably weaker than the driver's typed hash: round 2 shipped an oracle
whose un-cast SUM(CASE...) returned DuckDB HUGEINT (int128) — values
equal, driver hash red, mirror green. The normalization below maps both
engines' types into a shared tag space in which int widths <= 64 bits
collapse (the driver demonstrably tolerates Spark int vs DuckDB BIGINT)
but HUGEINT stays distinct (not representable in Spark), so an un-cast
integer SUM now fails the mirror too (regression-tested)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm_spark_type(t: str) -> str:
    t = t.lower()
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t == "double":
        return "f64"
    if t == "float":
        return "f32"
    if t == "string":
        return "str"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith("array"):
        return "arr"
    if t == "binary":
        return "bin"
    return t  # date, decimal(p,s), ... compared verbatim


def _norm_duck_type(t: str) -> str:
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("HUGEINT", "UHUGEINT", "UBIGINT"):
        return "int128"          # NOT representable as a Spark long
    if t == "DOUBLE":
        return "f64"
    if t == "FLOAT":
        return "f32"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.endswith("[]") or t.startswith("LIST"):
        return "arr"
    if t == "BLOB":
        return "bin"
    return t.lower()             # DATE, DECIMAL(p,s), ...


def _assert_types_match(name, spark_dtypes, duck_cols, duck_types):
    sp = {c: _norm_spark_type(t) for c, t in spark_dtypes}
    du = {c: _norm_duck_type(str(t)) for c, t in zip(duck_cols, duck_types)}
    mismatched = {c: (sp.get(c), du.get(c))
                  for c in set(sp) | set(du) if sp.get(c) != du.get(c)}
    assert not mismatched, (
        f"{name}: column type mismatch (spark, oracle): {mismatched} — "
        "an 'int128' oracle side means an un-cast integer SUM/aggregate "
        "(wrap it in CAST(... AS BIGINT); see relational.Q12_SQL)")


def _canon_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


QUERY_NAMES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    from local_pdftodocx_ocr_spark.operators import dedup as _dedup

    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = q(spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    _dedup.release_caches()   # signature caches must not stack across the 85 queries

    if name not in oracles:
        # rows-only contract: must run and be non-empty & deterministic
        assert len(rows) > 0, f"{name}: empty result"
        rows2 = [tuple(r) for r in q(spark, SF_DIR).collect()]
        assert _canon(rows, cols) == _canon(rows2, cols), f"{name}: nondeterministic"
        return

    con = _duck()
    rel = con.sql(oracles[name])
    ocols = list(rel.columns)
    otypes = [str(t) for t in rel.types]
    orows = rel.fetchall()

    assert sorted(cols) == sorted(ocols), \
        f"{name}: column mismatch {sorted(cols)} vs {sorted(ocols)}"
    _assert_types_match(name, df.dtypes, ocols, otypes)
    assert len(rows) == len(orows), \
        f"{name}: row count {len(rows)} vs oracle {len(orows)}"
    got, exp = _canon(rows, cols), _canon(orows, ocols)
    if got != exp:
        diffs = [(g, e) for g, e in zip(got, exp) if g != e][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_mirror_catches_uncast_integer_sum(spark):
    """Regression for the round-2 HUGEINT escape: the PRE-FIX form of
    ERROR_RATE_SQL (integer SUM(CASE...) without CAST AS BIGINT) must
    now fail the mirror's type check even though every stringified
    value matches."""
    from local_pdftodocx_ocr_spark.operators import relational

    uncast_sql = relational.ERROR_RATE_SQL.replace(
        "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors",
        "SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors")
    assert uncast_sql != relational.ERROR_RATE_SQL, \
        "fixture drift: ERROR_RATE_SQL no longer contains the cast form"

    df = relational.events_error_rate_hours(spark, SF_DIR)
    con = _duck()
    rel = con.sql(uncast_sql)
    otypes = [str(t) for t in rel.types]
    assert "HUGEINT" in otypes  # DuckDB's integer SUM really is int128
    # stringified values are identical (what the old mirror compared)...
    assert _canon([tuple(r) for r in df.collect()], df.columns) == \
        _canon(rel.fetchall(), list(rel.columns))
    # ...but the type gate now rejects it
    with pytest.raises(AssertionError, match="int128"):
        _assert_types_match("uncast", df.dtypes, list(rel.columns), otypes)
    # and the FIXED oracle passes the same gate
    fixed = con.sql(relational.ERROR_RATE_SQL)
    _assert_types_match("fixed", df.dtypes, list(fixed.columns),
                        [str(t) for t in fixed.types])


def test_emb_near_dup_at_scale_equals_all_pairs(spark):
    """The LSH-candidates -> exact-verify composition must land on the
    exact all-pairs answer (full recall on this corpus; the seeded
    hyperplanes make this deterministic)."""
    from local_pdftodocx_ocr_spark.operators import similarity

    for sf_dir in ("/root/testdata/sf0.001", SF_DIR):
        exact = {tuple(r) for r in
                 similarity.embedding_near_dup_pairs(spark, sf_dir).collect()}
        scaled = {tuple(r) for r in
                  similarity.embedding_near_dup_pairs_at_scale(
                      spark, sf_dir).collect()}
        assert scaled == exact, (
            f"{sf_dir}: at-scale near-dup diverged from all-pairs "
            f"(missing={len(exact - scaled)}, extra={len(scaled - exact)})")


def test_every_query_has_an_oracle():
    """Driver-contract completeness: every queries() entry carries an
    oracle (SQL or sequential VALUES) and no oracle is orphaned — a
    query without an oracle silently downgrades to the weaker rows-only
    driver check."""
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert qs == os_, (sorted(qs - os_), sorted(os_ - qs))


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "kind", "text", "media_ref", "offset"]
