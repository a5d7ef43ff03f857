"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against its oracle_sql() via DuckDB — row count, column
names, and order-insensitive value equality (columns sorted by name, cells
canonicalized to strings, rows sorted)."""

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
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = q(spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]

    if name not in oracles:
        # rows-only contract: must run and be non-empty & deterministic
        assert len(rows) > 0, f"{name}: empty result"
        rows2 = [tuple(r) for r in q(spark, SF_DIR).collect()]
        assert _canon(rows, cols) == _canon(rows2, cols), f"{name}: nondeterministic"
        return

    con = _duck()
    res = con.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(cols) == sorted(ocols), \
        f"{name}: column mismatch {sorted(cols)} vs {sorted(ocols)}"
    assert len(rows) == len(orows), \
        f"{name}: row count {len(rows)} vs oracle {len(orows)}"
    got, exp = _canon(rows, cols), _canon(orows, ocols)
    if got != exp:
        diffs = [(g, e) for g, e in zip(got, exp) if g != e][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "kind", "text", "media_ref", "offset"]
