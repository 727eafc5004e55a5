#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver's timing; every extra measurement lives here — guide §1).

Modes:
  --explain NAME[,NAME...]   write plans/r06/<name>.txt with
                             .explain('formatted') of a declared query
  --time NAME[,NAME...]      best-of-N wall of declared queries (count,
                             same methodology as bench.py's _timed_query)
  --noop NAME                time a declared query through the noop sink
                             (computes every column, guide §1.4)
  --phase dedup_minhash|dedup_oph|sketch|lpm
                             per-phase timing of the composite bench
                             workloads at --sf-dir
Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def make_spark():
    from ip_filter_spark.config import get_spark

    spark = get_spark(
        app_name="ip_filter_spark-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timeit(fn, reps: int) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def do_explain(names: list[str], sf_dir: str, outdir: str, suffix: str) -> None:
    from ip_filter_spark.queries import QUERIES

    spark = make_spark()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {outdir}/{name}_{suffix}.txt ({len(plan)} bytes)")
    spark.stop()


def do_time(names: list[str], sf_dir: str, reps: int, use_noop: bool) -> None:
    from ip_filter_spark.queries import QUERIES

    spark = make_spark()
    res = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")

        def run(n=name):
            df = QUERIES[n](spark, sf_dir)
            if use_noop:
                noop(df)
            else:
                df.count()

        res[name] = _timeit(run, reps)
        spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "reps": res}))
    spark.stop()


# ------------------------------------------------------ composite workloads
def phase_dedup(sf_dir: str, which: str, reps: int) -> None:
    """Split dedup_minhash / dedup_oph into signature build vs banded
    tail vs verify, each through the noop sink."""
    from pyspark.sql import functions as F

    from ip_filter_spark.operators import dedup
    from ip_filter_spark.sources.corpus import synthesize_corpus

    spark = make_spark()
    n_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    corpus = synthesize_corpus(spark, n_rows, n_repos=max(100, n_rows // 600), seed=5, dup_fraction=0.05)
    corpus = corpus.withColumn("id", F.xxhash64("repo", "path", "content")).cache()
    corpus.count()
    out: dict = {"n_rows": n_rows}

    if which == "dedup_minhash":
        sig_fn = lambda: dedup.minhash_signatures(corpus, "id", "content", 64, 3, "sha", 11)
        pair_fn = lambda s: dedup._banded_pairs(s, 64, 16, 0.8, 200)
    else:
        sig_fn = lambda: dedup.oph_signatures(corpus, "id", "content", 64, 3, "sha").select("id", "sig")
        pair_fn = lambda s: dedup._banded_pairs(s, 64, 16, 0.8, 200, stride=16)

    spark.sparkContext.setJobDescription(f"{which}: signatures noop")
    out["sig_noop"] = _timeit(lambda: noop(sig_fn()), reps)

    # banded tail over a cached signature table (what _banded_pairs sees)
    def full():
        sig = sig_fn().cache()
        n = pair_fn(sig).count()
        sig.unpersist()
        return n

    spark.sparkContext.setJobDescription(f"{which}: full pairs count")
    out["full_pairs"] = _timeit(full, reps)

    # tail alone: materialize+cache sig first (untimed), then pairs
    sig = sig_fn().cache()
    sig.count()
    spark.sparkContext.setJobDescription(f"{which}: banded tail only")
    out["tail_only"] = _timeit(lambda: pair_fn(sig).count(), reps)
    sig.unpersist()
    print(json.dumps(out))
    spark.stop()


def phase_lpm(sf_dir: str, reps: int) -> None:
    """bench_lpm split: engine build vs probe."""
    from ip_filter_spark.operators.lpm import PathLPM, derive_prefix_table
    from ip_filter_spark.sources.corpus import corpus_from_sf_dir

    spark = make_spark()
    corpus = corpus_from_sf_dir(spark, sf_dir, num_partitions=CPUS * 2).cache()
    n = corpus.count()
    routes = derive_prefix_table(corpus, max_depth=3)
    out = {"rows": n}
    out["build"] = _timeit(lambda: PathLPM.build(routes, num_partitions=max(CPUS, 8)), reps)
    eng = PathLPM.build(routes, num_partitions=max(CPUS, 8))
    probes = corpus.select("path").coalesce(max(CPUS // 2, 4))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    out["probe"] = _timeit(
        lambda: eng.lookup(probes, mode="guided").where("lpm_depth > 0").count(), reps
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--explain")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--outdir", default="plans/r06")
    ap.add_argument("--time")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--phase")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()
    if args.explain:
        do_explain(args.explain.split(","), args.sf_dir, args.outdir, args.suffix)
    elif args.time:
        do_time(args.time.split(","), args.sf_dir, args.reps, args.noop)
    elif args.phase in ("dedup_minhash", "dedup_oph"):
        phase_dedup(args.sf_dir, args.phase, args.reps)
    elif args.phase == "lpm":
        phase_lpm(args.sf_dir, args.reps)
    else:
        ap.print_help()
