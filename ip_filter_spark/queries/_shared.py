"""Cross-domain helpers, constants, and oracle-SQL builders shared by the per-domain gate modules.

Split out of the former monolithic queries.py; see package __init__ for
the assembled QUERIES/ORACLES registry (order preserved exactly).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ip_filter_spark.functions.text import (
    LANG_MARKERS,
    MOD,
    fingerprint_expr,
    lang_id_expr,
    ngrams_expr,
    token_count_expr,
    tokens_expr,
)

QS = [0.1, 0.25, 0.5, 0.75, 0.9]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec_sum(col, alias):
    """Exact decimal sum exposed as double (see module docstring)."""
    return F.sum(col.cast("decimal(18,4)")).cast("double").alias(alias)


SESSION_WINDOW_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
g AS (
  SELECT user_id, t,
         CASE WHEN t - LAG(t) OVER w IS NULL OR t - LAG(t) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
s AS (
  SELECT user_id, t,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g)
SELECT user_id,
       CAST(MIN(t) // 1000000 AS BIGINT) AS start_s,
       CAST((MAX(t) + 1800000000) // 1000000 AS BIGINT) AS end_s,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, session_idx
"""


RANGE_JOIN_SQL = """
WITH r AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS s
  FROM events WHERE event_type = 'purchase'),
l AS (
  SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, event_type
  FROM events WHERE event_type IN ('click', 'view'))
SELECT l.event_id, l.user_id, l.t AS ts_s, l.event_type, r.purchase_id,
       r.s AS purchase_s, l.t - r.s AS delay_s
FROM l JOIN r ON l.user_id = r.user_id AND l.t BETWEEN r.s AND r.s + 3600
"""


_SQL_TOKENS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"


def _sql_shingles(n: int = 3) -> str:
    """DuckDB expression for the distinct token n-gram shingle list —
    exact twin of operators.dedup.shingles_expr."""
    t = _SQL_TOKENS
    return (
        f"list_distinct(CASE WHEN len({t}) >= {n} "
        f"THEN list_transform(range(1, len({t}) - {n - 2}), "
        f"i -> array_to_string(list_slice({t}, i, i + {n - 1}), ' ')) "
        f"ELSE [array_to_string({t}, ' ')] END)"
    )


CDC_UPSERT_SQL = """
SELECT user_id, ts AS last_ts, event_id AS last_event_id,
       event_type AS last_type, value AS last_value
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def _epoch_us(col_name: str):
    """Exact epoch-microseconds from a TIMESTAMP_NTZ column, independent
    of the session time zone (pure wall-clock arithmetic — unlike
    to_timestamp_ltz/unix_micros, which shift by the driver's zone).
    DuckDB twin: ``epoch_us(ts)``, which treats naive timestamps the
    same way."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col_name})"
    )


def _ensure_shipped(spark: SparkSession) -> None:
    from ip_filter_spark.config import _ship_package

    try:
        _ship_package(spark)
    except Exception:
        pass  # already added or running where cwd import suffices


def incremental_minhash_sql(
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_bucket: int = 200,
    seed: int = 11,
) -> str:
    """DuckDB replica of build_lsh_index + query_lsh_index over the
    doc_id%4 split: same signatures/band keys as minhash_lsh_sql, the
    bucket cap counted over the OLD (indexed) side only — exactly the
    ``n_in_bucket`` column the index materializes — and candidates
    restricted to new x old."""
    from ip_filter_spark.operators.dedup import _BAND_K, MINHASH_P, minhash_coeffs

    a_c, b_c = minhash_coeffs(num_perm, seed)
    r = num_perm // bands
    P = MINHASH_P
    sig_cols = ",\n       ".join(
        f"MIN((h * {a_c[p]} + {b_c[p]}) % {P}) AS s{p}" for p in range(num_perm)
    )

    def key_expr(b: int) -> str:
        acc = str(b + 1)
        for j in range(r):
            acc = f"(({acc}) * {_BAND_K} + s{b * r + j}) % {P}"
        return acc

    banded = "\n  UNION ALL\n".join(
        f"  SELECT id, {b} AS band, {key_expr(b)} AS key FROM sig" for b in range(bands)
    )
    sig_list = ", ".join(f"s{p}" for p in range(num_perm))
    return f"""
WITH shg AS (
  SELECT DISTINCT doc_id AS id, unnest({_sql_shingles(shingle_n)}) AS sh FROM documents),
h AS (SELECT id, CAST('0x' || substr(sha256(sh), 1, 15) AS BIGINT) % {P} AS h FROM shg),
sig AS (SELECT id,
       {sig_cols}
FROM h GROUP BY id),
sigl AS (SELECT id, [{sig_list}] AS sl FROM sig),
banded AS (
{banded}),
oldb AS (SELECT * FROM banded WHERE id % 4 <> 0),
newb AS (SELECT * FROM banded WHERE id % 4 = 0),
ok AS (SELECT band, key FROM oldb GROUP BY band, key HAVING COUNT(*) <= {max_bucket}),
cand AS (
  SELECT DISTINCT n.id AS new_id, o.id AS old_id
  FROM newb n JOIN oldb o ON n.band = o.band AND n.key = o.key
  JOIN ok ON ok.band = n.band AND ok.key = n.key),
est AS (
  SELECT new_id, old_id,
         ROUND(list_sum(list_transform(range(1, {num_perm + 1}),
               i -> CASE WHEN sa.sl[i] = sb.sl[i] THEN 1 ELSE 0 END)) / {float(num_perm)}, 6) AS est_jaccard
  FROM cand JOIN sigl sa ON sa.id = cand.new_id JOIN sigl sb ON sb.id = cand.old_id)
SELECT new_id, old_id, est_jaccard FROM est WHERE est_jaccard >= {threshold}
"""


__all__ = [
    "QS",
    "_t",
    "_dec_sum",
    "SESSION_WINDOW_SQL",
    "RANGE_JOIN_SQL",
    "_SQL_TOKENS",
    "_sql_shingles",
    "CDC_UPSERT_SQL",
    "_epoch_us",
    "_ensure_shipped",
    "incremental_minhash_sql",
]
