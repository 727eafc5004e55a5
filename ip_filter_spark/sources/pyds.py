"""Spark 4 Python DataSource — the engine's hash kernel as a first-class
``spark.read.format(...)`` provider.

The Python DataSource API (SPARK-44076, GA in Spark 4) is the modern way
to plug a custom source into Catalyst from Python: the driver plans
``InputPartition`` objects, each executor task materializes its partition
as Arrow batches — real partition-parallel planning, not a
``spark.range`` + UDF workaround.  ``SplitmixDataSource`` exposes the
library's splitmix64 finalizer (``sketches.hashing.rehash`` — the hash
family under CMS rows, Count-Sketch signs, JL projections and ICWS
streams) as a deterministic keyed table: rows ``(i, h = splitmix(i,
seed))`` for ``i`` in ``[0, n)``, split into ``partitions`` equal
ranges.

Why it earns its place beyond the demo: a deterministic, seeded,
infinitely-scalable keyed table is the standard harness for shuffle /
probe benchmarks and absent-key generation, and making it a *source*
(instead of an expression pipeline) means the row generation runs
before the first Exchange with zero scan input.  The gate's DuckDB
oracle recomputes the identical uint64 stream with HUGEINT
split-multiply modular arithmetic — bit-exact cross-engine.

Usage::

    spark.dataSource.register(SplitmixDataSource)
    df = (spark.read.format("ifs_splitmix")
          .option("n", 100000).option("seed", 7).option("partitions", 16)
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SplitmixReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 7))
        self.parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        step = -(-self.n // self.parts)  # ceil
        return [
            _Range(s, min(s + step, self.n)) for s in range(0, self.n, max(step, 1))
        ]

    def read(self, partition: _Range):
        import numpy as np
        import pyarrow as pa

        from ip_filter_spark.sketches.hashing import rehash

        i = np.arange(partition.start, partition.end, dtype=np.uint64)
        h = rehash(i, self.seed)
        # BIGINT column = the uint64 stream reinterpreted as signed
        # (two's complement view — what the DuckDB oracle replicates)
        yield pa.record_batch(
            [pa.array(i.astype(np.int64)), pa.array(h.view(np.int64))],
            names=["i", "h"],
        )


class SplitmixDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ifs_splitmix"

    def schema(self) -> str:
        return "i bigint, h bigint"

    def reader(self, schema) -> SplitmixReader:
        return SplitmixReader(self.options)
