"""Quantile queries: exact rank-based formulation (oracle-checkable) +
KLL / t-digest sketch paths.

The exact form picks the element at row_number == floor((n-1)*q)+1 of the
sorted order — a discrete, interpolation-free definition that DuckDB and
Spark compute identically (unlike percentile_cont interpolation, whose
float rounding can differ)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ip_filter_spark.engine import SketchSpec, build_and_merge


def exact_quantiles(df: DataFrame, value_col: str, qs: list[float]) -> DataFrame:
    """(q, value) rows: the lower exact quantile of value_col at each q."""
    n = df.count()
    w = Window.orderBy(F.col("value"))
    ranked = df.select(F.col(value_col).alias("value")).withColumn("rn", F.row_number().over(w))
    targets = [(float(q), int((n - 1) * q) + 1) for q in qs]
    tdf = df.sparkSession.createDataFrame(targets, "q double, rn int")
    return ranked.join(tdf, on="rn", how="inner").select("q", "value").orderBy("q")


def sketch_quantiles(
    df: DataFrame, value_col: str, qs: list[float], kind: str = "kll", **params
) -> list[tuple[float, float]]:
    """Quantiles from a distributed KLL or t-digest build (one pass)."""
    assert kind in ("kll", "tdigest")
    spec = SketchSpec(kind, params or ({"k": 200} if kind == "kll" else {"delta": 200.0}), on="value")
    sk = build_and_merge(df, [spec], value=value_col)[spec.key()]
    vals = sk.quantile(qs)
    return [(float(q), float(v)) for q, v in zip(qs, vals)]
