"""Parquet table sources for the driver testdata star schema."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, name: str, base_dir: str | None = None) -> DataFrame:
    base = base_dir or sf_dir()
    return spark.read.parquet(f"{base}/{name}.parquet")


def load_tables(spark: SparkSession, base_dir: str | None = None) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, base_dir) for t in TABLES}


def read_source_table(spark: SparkSession, ref: str, fmt: str | None = None) -> DataFrame:
    """Read the corpus table from any of the deployment forms the engine
    targets, by reference string:

    - ``iceberg:<catalog.db.table>`` — an Iceberg catalog table (the
      10^12-file production shape: snapshot isolation, partition pruning
      and file skipping come from the catalog's manifests; the engine
      itself only ever sees a DataFrame, so nothing else changes).
    - ``<path>`` ending in ``.parquet`` or a directory — plain parquet.
    - ``fmt=`` overrides detection (``"iceberg" | "parquet" | "orc" |
      "csv"``).

    Iceberg needs the runtime jars + catalog conf on the cluster
    (``spark.sql.catalog.<name>`` settings); this sandbox ships neither,
    so the iceberg branch raises a clear error locally and is exercised
    by its table-name plumbing test only. Everything downstream of this
    function is format-agnostic.
    """
    kind = fmt
    table_ref = ref
    if ref.startswith("iceberg:"):
        kind, table_ref = "iceberg", ref[len("iceberg:") :]
    if kind == "iceberg":
        try:
            return spark.read.format("iceberg").load(table_ref)
        except Exception as e:  # runtime jars / catalog conf absent
            raise RuntimeError(
                f"Iceberg table {table_ref!r} needs the iceberg-spark-runtime jar and a "
                "spark.sql.catalog.* configuration on the cluster; neither is present here. "
                "Pass a parquet path to run locally."
            ) from e
    if kind in (None, "parquet"):
        return spark.read.parquet(table_ref)
    return spark.read.format(kind).load(table_ref)
