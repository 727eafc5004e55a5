"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin side-by-side on the same parquet via
DuckDB, compare row counts + order-insensitive values.

This is the highest-leverage test in the repo: if it's green here at
sf0.001, CORRECTNESS_r{N}.json should be green at sf0.01.

Round-1 lesson (VERDICT.md "What's wrong" #3): the driver's value-hash
is FULL-precision and TYPE-aware — DuckDB widening SUM(BIGINT) to
HUGEINT surfaces as float64 through pandas/Arrow and hash-mismatches an
int64 from Spark even when the values are numerically identical. So
this replica fetches both sides through pandas (like the driver) and
normalizes cells with type-distinguishing full-precision repr: an int
is "i:123", a float is "f:" + repr (17 significant digits). No rounding,
no str() flattening.
"""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

# default sf0.001 for speed; CI-style full check: IFS_ORACLE_SF_DIR=/root/testdata/sf0.01
SF_DIR = os.environ.get("IFS_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(x):
    if x is None or x is pd.NaT or (isinstance(x, float) and math.isnan(x)):
        return "null"
    if isinstance(x, (np.floating, float)):
        return "f:" + repr(float(x))
    if isinstance(x, (np.integer, int)) and not isinstance(x, bool):
        return "i:" + repr(int(x))
    if isinstance(x, (bool, np.bool_)):
        return "b:" + str(bool(x))
    if isinstance(x, (bytes, bytearray)):
        return "x:" + bytes(x).hex()
    import decimal

    if isinstance(x, decimal.Decimal):
        # driver-visible widened type — deliberately NOT folded into int/float
        return "d:" + str(x)
    return "s:" + str(x)


def _norm_pdf(pdf: pd.DataFrame):
    cols = sorted(pdf.columns.str.lower())
    pdf = pdf.rename(columns=str.lower)[cols]
    return cols, sorted(tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None))


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
    spdf = q(spark, SF_DIR).toPandas()
    dpdf = _duck(SF_DIR).execute(sql).df()

    scols, a = _norm_pdf(spdf)
    dcols, b = _norm_pdf(dpdf)
    assert scols == dcols, f"{name}: column sets differ: {scols} vs {dcols}"
    assert len(a) == len(b), f"{name}: row counts differ: {len(a)} vs {len(b)}"
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
