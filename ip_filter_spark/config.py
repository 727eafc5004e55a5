"""SparkSession construction with scale-aware defaults.

All knobs here are chosen for the 100 TB design point and then scaled
down for local testing:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing),
- Arrow on for every pandas UDF boundary, with a bounded batch size so the
  per-batch numpy working set (batch x L masked-key matrices in the LPM
  kernel) stays in cache,
- shuffle partitions sized to the local core count; on a real cluster this
  is set to ~2-3x total executor cores and AQE coalesces from there.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

# Arrow batch size: the guided-LPM probe materialises a (batch, L, 8)
# uint64 working set per batch; 10k rows x 16 depths x 8B ~ 1.3 MB —
# cache-friendly and far below executor memory at any scale.
ARROW_BATCH = 10_000


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))


def get_spark(
    app_name: str = "ip_filter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make the library importable on executors regardless of cwd: zip the
    package and addPyFile it — the programmatic equivalent of
    ``spark-submit --py-files ip_filter_spark.zip`` (north-rule packaging)."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "ip_filter_spark_pkg.zip")
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    ):
        # per-process tmp name: concurrent sessions (multi-executor bench
        # harnesses) may rebuild simultaneously, and a shared ".tmp" lets
        # one process's os.replace steal another's staging file
        tmp = f"{zip_path}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
