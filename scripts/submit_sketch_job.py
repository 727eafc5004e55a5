"""spark-submit entrypoint — the north-rule packaging path.

Run as:
    spark-submit --py-files /path/to/ip_filter_spark.zip \
        scripts/submit_sketch_job.py <sf_dir>

The script imports ip_filter_spark ONLY from the shipped zip (it must
work with any cwd), builds the five-sketch suite over the corpus derived
from <sf_dir>, and prints one JSON line with row count + estimates so a
cluster operator can smoke-check a deployment."""

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("ifs-submit-smoke").getOrCreate()
    from ip_filter_spark.engine import SketchSpec, build_and_merge
    from ip_filter_spark.sources.corpus import corpus_from_sf_dir

    corpus = corpus_from_sf_dir(spark, sf_dir)
    specs = [
        SketchSpec("bloom", {"fpp": 1e-4, "n": 100_000}),
        SketchSpec("hll", {"p": 12}),
        SketchSpec("cms", {"eps": 1e-3, "delta": 1e-3}),
        SketchSpec("kll", {"k": 200}, on="value"),
        SketchSpec("tdigest", {"delta": 200.0}, on="value"),
    ]
    sketches = build_and_merge(corpus, specs, key="content", value=F.length("content"))
    hll = sketches[specs[1].key()]
    kll = sketches[specs[3].key()]
    print(
        json.dumps(
            {
                "rows": int(sketches[specs[0].key()].n_items),
                "hll_estimate": round(float(hll.estimate()), 1),
                "kll_median": round(float(kll.quantile(0.5)), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
