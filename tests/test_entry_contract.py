"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin side-by-side on the same parquet via
DuckDB, compare row counts + order-insensitive values (floats rounded).

This is the highest-leverage test in the repo: if it's green here at
sf0.001, CORRECTNESS_r{N}.json should be green at sf0.01.
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "nan"
        return f"{x:.6g}"
    if isinstance(x, bytes):
        return x.hex()
    return str(x)


def _norm_rows(cols, rows):
    ix = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in ix) for r in rows)


ORACLE_NAMES = sorted(entry_mod.oracle_sql())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "path", "lpm_depth", "lpm_prefix"}


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = q(spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(SF_DIR)
    res = con.execute(sql)
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row counts differ: {len(srows)} vs {len(drows)}"
    a = _norm_rows(scols, srows)
    b = _norm_rows(dcols, drows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_rows_only_queries_run(spark):
    """Queries without oracles still must run and return stable schemas."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = qs[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        assert len(df.columns) > 0, name
