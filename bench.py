#!/usr/bin/env python
"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extra": {...}}

--scaling: run the sketch-build job at two parallelism levels (local[8]
vs local[32]) in fresh subprocesses on identical input and write
BENCH/BASELINE.md with throughput at both + scaling efficiency
(the sandbox evidence for the north rule's N→4N ≥ 0.8 criterion).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def make_spark(cpus: int):
    from ip_filter_spark.config import get_spark

    return get_spark(
        app_name="ip_filter_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )


# ----------------------------------------------------------------- workloads
def bench_sketch_build(spark, sf_dir: str) -> dict:
    """The headline: one pass over the corpus building all five hash/value
    sketches simultaneously, tree-merged. Reports rows/sec."""
    from pyspark.sql import functions as F

    from ip_filter_spark.engine import SketchSpec, build_and_merge
    from ip_filter_spark.sources.corpus import corpus_from_sf_dir

    corpus = corpus_from_sf_dir(spark, sf_dir)
    n = corpus.count()
    specs = [
        SketchSpec("bloom", {"fpp": 1e-4, "n": max(n, 1000)}),
        SketchSpec("hll", {"p": 14}),
        SketchSpec("cms", {"eps": 1e-4, "delta": 1e-3}),
        SketchSpec("kll", {"k": 200}, on="value"),
        SketchSpec("tdigest", {"delta": 200.0}, on="value"),
    ]
    t0 = time.perf_counter()
    sketches = build_and_merge(corpus, specs, key="content", value=F.length("content"))
    dt = time.perf_counter() - t0
    hll = sketches[specs[1].key()]
    return {"sec": dt, "rows": n, "rows_per_sec": n / dt, "hll_estimate": hll.estimate()}


def bench_lpm(spark, sf_dir: str) -> dict:
    from ip_filter_spark.operators.lpm import PathLPM, derive_prefix_table
    from ip_filter_spark.sources.corpus import corpus_from_sf_dir

    corpus = corpus_from_sf_dir(spark, sf_dir).cache()
    n = corpus.count()
    routes = derive_prefix_table(corpus, max_depth=3)
    t0 = time.perf_counter()
    eng = PathLPM.build(routes, num_partitions=max(CPUS, 8))
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    found = eng.lookup(corpus.select("path"), mode="guided").where("lpm_depth > 0").count()
    probe_s = time.perf_counter() - t0
    corpus.unpersist()
    return {"sec": build_s + probe_s, "build_sec": build_s, "probe_sec": probe_s, "queries": n, "found": found,
            "probe_rows_per_sec": n / probe_s}


def _timed_query(name):
    def run(spark, sf_dir):
        from ip_filter_spark.queries import QUERIES

        t0 = time.perf_counter()
        cnt = QUERIES[name](spark, sf_dir).count()
        return {"sec": time.perf_counter() - t0, "rows": cnt}

    return run


def bench_dedup_minhash(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from ip_filter_spark.operators.dedup import minhash_lsh_pairs
    from ip_filter_spark.sources.corpus import corpus_from_sf_dir

    corpus = corpus_from_sf_dir(spark, sf_dir).withColumn("id", F.xxhash64("path"))
    t0 = time.perf_counter()
    n = minhash_lsh_pairs(corpus, "id", "content", num_perm=64, bands=16, threshold=0.8).count()
    return {"sec": time.perf_counter() - t0, "pairs": n}


WORKLOADS = {
    "sketch_build_all": bench_sketch_build,
    "lpm_build_probe": bench_lpm,
    "dedup_minhash": bench_dedup_minhash,
    "q1_pricing_summary": _timed_query("q1_pricing_summary"),
    "q3_shipping_priority": _timed_query("q3_shipping_priority"),
    "q5_nation_revenue": _timed_query("q5_nation_revenue"),
    "events_topk_exact": _timed_query("events_topk_exact"),
    "quantiles_exact": _timed_query("quantiles_exact"),
    "kll_price_quantiles": _timed_query("kll_price_quantiles"),
    "cosine_topk_exact": _timed_query("cosine_topk_exact"),
    "lpm_exact_docs": _timed_query("lpm_exact_docs"),
}


def run_bench(only: str | None = None, cpus: int = CPUS, sf_dir: str = SF_DIR) -> dict:
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}
    extra: dict[str, dict] = {}
    names = [only] if only else list(WORKLOADS)
    for name in names:
        res = WORKLOADS[name](spark, sf_dir)
        queries[name] = round(res["sec"], 3)
        extra[name] = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in res.items() if k != "sec"}
    spark.stop()
    return {
        "metric": "headline query wall-clock at sf on local[%d]" % cpus,
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(sf_dir),
        "extra": extra,
    }


def run_scaling(sf_dir: str = SF_DIR, levels=(8, 32)) -> None:
    """Same job, same input, two parallelism levels, fresh JVMs."""
    results = {}
    for cpus in levels:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", "sketch_build_all", "--cpus", str(cpus), "--sf-dir", sf_dir],
            capture_output=True,
            text=True,
            timeout=1800,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    lo, hi = levels
    r_lo = results[lo]["extra"]["sketch_build_all"]["rows_per_sec"]
    r_hi = results[hi]["extra"]["sketch_build_all"]["rows_per_sec"]
    eff = r_hi / (r_lo * (hi / lo))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling evidence (north rule: efficiency >= 0.8 from N to 4N)

Job: one-pass build of all five sketches (bloom+hll+cms+kll+tdigest) over the
corpus derived from `{sf_dir}` (identical input at both levels), fresh JVM per level.

| parallelism | rows | wall (s) | rows/sec |
|---|---|---|---|
| local[{lo}] | {results[lo]['extra']['sketch_build_all']['rows']} | {results[lo]['queries']['sketch_build_all']} | {r_lo:,.0f} |
| local[{hi}] | {results[hi]['extra']['sketch_build_all']['rows']} | {results[hi]['queries']['sketch_build_all']} | {r_hi:,.0f} |

**Scaling efficiency ({lo}→{hi} cores): {eff:.3f}** = (rows/s @{hi}) / ({hi//lo} × rows/s @{lo})

Caveat: single-node local mode — the {hi//lo}× level shares one JVM, memory
bus and shuffle disk, so this under-reports true multi-executor scaling
(where each 4× slice brings its own memory bandwidth and I/O). Per-partition
sketch build is embarrassingly parallel with KB-size merge traffic, so the
cluster bound is the scan, which scales with executors.
"""
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3), "levels": {str(k): results[k]["extra"]["sketch_build_all"] for k in levels}}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only")
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()
    if args.scaling:
        run_scaling(args.sf_dir)
    else:
        print(json.dumps(run_bench(args.only, args.cpus, args.sf_dir)))
