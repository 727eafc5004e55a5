"""Guided-LPM tests, mirroring the reference's strategy (SURVEY.md §5):
golden fixture lookups (tests.py_bak:309-349 analog), fallback ≡ linear
(:351-394), and the triple-agreement oracle guided ≡ linear ≡ exact
(:396-445) — strengthened here to per-row equality, not just counts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ip_filter_spark.operators.lpm import PathLPM, derive_prefix_table, exact_lpm
from ip_filter_spark.plans.obst import GuideTree
from ip_filter_spark.sources.corpus import synthesize_corpus

# 8-route fixture shaped like the reference's 8-prefix test table
# (tests.py_bak:33-39: includes nested routes and depth gaps)
FIXTURE_ROUTES = [
    ("a", 1),
    ("a/b", 2),
    ("a/b/c", 3),
    ("x", 1),
    ("x/y/z/w", 4),
    ("q/r", 2),
    ("m/n/o", 3),
    ("a/k", 2),
]

# traffic fixture: like tests.py_bak:339-349, 3 of 5 match
FIXTURE_QUERIES = [
    ("a/b/c/file.py", 3),  # matches a/b/c
    ("a/k/deep/file.c", 2),  # matches a/k
    ("zz/top/none", 0),  # default route
    ("x/y/z/w", 4),  # exact full-path route
    ("q/other", 0),  # q alone is not a route
]


@pytest.fixture(scope="module")
def fixture_lpm(spark):
    pdf = spark.createDataFrame(FIXTURE_ROUTES, "prefix string, depth int")
    return PathLPM.build(pdf, num_partitions=4)


def test_obst_shape():
    t = GuideTree.balanced([1, 2, 3, 4])
    assert t.height() <= 3
    assert sorted(t.val.tolist()) == [1, 2, 3, 4]
    # walk reaches each key, EQ-terminated
    for k in [1, 2, 3, 4]:
        w = t.walk(k)
        assert w[-1] == (k, "EQ")
    # skewed weights pull the hot key to the root
    t2 = GuideTree.from_weights([1, 2, 3, 4], [0.01, 0.01, 0.01, 100.0])
    assert int(t2.val[t2.root]) == 4


def test_lpm_goldens_guided_and_linear(spark, fixture_lpm):
    q = spark.createDataFrame([(p,) for p, _ in FIXTURE_QUERIES], "path string")
    for mode in ("guided", "linear"):
        got = {r.path: r.lpm_depth for r in fixture_lpm.lookup(q, mode=mode).collect()}
        for path, want in FIXTURE_QUERIES:
            assert got[path] == want, (mode, path, got[path], want)
    n_found = sum(1 for _, d in FIXTURE_QUERIES if d > 0)
    assert n_found == 3  # 3/5 match, like the reference traffic fixture


def test_exact_lpm_oracle(spark):
    pdf = spark.createDataFrame(FIXTURE_ROUTES, "prefix string, depth int")
    q = spark.createDataFrame([(p,) for p, _ in FIXTURE_QUERIES], "path string")
    got = {r.path: r.lpm_depth for r in exact_lpm(q, pdf).collect()}
    for path, want in FIXTURE_QUERIES:
        assert got[path] == want


def test_lpm_prefix_column(spark, fixture_lpm):
    q = spark.createDataFrame([("a/b/c/file.py",), ("zz/none",)], "path string")
    rows = {r.path: r.lpm_prefix for r in fixture_lpm.lookup(q).collect()}
    assert rows["a/b/c/file.py"] == "a/b/c"
    assert rows["zz/none"] is None


def test_triple_agreement_on_corpus(spark):
    """guided ≡ linear ≡ exact, per-row, on a synthetic corpus — the
    reference's big oracle (tests.py_bak:396-445) strengthened."""
    corpus = synthesize_corpus(spark, 3000, n_repos=30, seed=11, num_partitions=4).cache()
    routes = derive_prefix_table(corpus.withColumn("path", F.concat_ws("/", "repo", "path")), max_depth=3)
    lpm = PathLPM.build(routes, num_partitions=4)
    queries = corpus.select(F.concat_ws("/", "repo", "path").alias("path")).limit(1000).cache()

    exact = {r.path: r.lpm_depth for r in exact_lpm(queries, routes).collect()}
    guided_rows = lpm.lookup(queries, mode="guided").collect()
    guided = {r.path: r.lpm_depth for r in guided_rows}
    linear = {r.path: r.lpm_depth for r in lpm.lookup(queries, mode="linear").collect()}

    assert guided == exact
    assert linear == exact
    # guided must actually save probes vs linear on average
    g_bits = np.mean([r.bit_lookups for r in guided_rows])
    l_bits = np.mean([r.bit_lookups for r in lpm.lookup(queries, mode="linear").collect()])
    assert g_bits < l_bits, (g_bits, l_bits)


def test_lpm_serialization_roundtrip(spark, fixture_lpm):
    blob = fixture_lpm.to_bytes()
    back = PathLPM.from_bytes(blob)
    assert back.to_bytes() == blob
    q = spark.createDataFrame([(p,) for p, _ in FIXTURE_QUERIES], "path string")
    got = {r.path: r.lpm_depth for r in back.lookup(q).collect()}
    for path, want in FIXTURE_QUERIES:
        assert got[path] == want


def test_local_and_distributed_build_byte_identical(spark):
    """The adaptive small-table build (driver-local numpy pass over the
    insert rows) must produce the exact same filter bytes as the
    distributed partials -> tree_merge path it replaces; forcing
    local_build_max_inserts=0 exercises the distributed branch on the
    same routes."""
    from ip_filter_spark.operators.lpm import PathLPM, derive_prefix_table
    from ip_filter_spark.sources.corpus import synthesize_corpus

    corpus = synthesize_corpus(spark, 2000, n_repos=50, seed=3)
    routes = derive_prefix_table(corpus, max_depth=3)
    local = PathLPM.build(routes, num_partitions=4)
    dist = PathLPM.build(routes, num_partitions=4, local_build_max_inserts=0)
    assert local.to_bytes() == dist.to_bytes()


def test_arrow_int64_view_paths():
    """The mapInArrow probe's uint64 view must round-trip signed Arrow
    int64 values bit-exactly on dense, sliced, and chunked arrays."""
    import numpy as np
    import pyarrow as pa

    from ip_filter_spark.operators.lpm import _arrow_int64

    vals = [0, 1, -1, 2**63 - 1, -(2**63), 42, -12345]
    expect = np.array(vals, dtype=np.int64).view(np.uint64)

    dense = pa.array(vals, type=pa.int64())
    assert (_arrow_int64(dense) == expect).all()
    assert (_arrow_int64(dense.slice(2, 4)) == expect[2:6]).all()
    chunked = pa.chunked_array([pa.array(vals[:3], type=pa.int64()), pa.array(vals[3:], type=pa.int64())])
    assert (_arrow_int64(chunked) == expect).all()
    assert _arrow_int64(pa.array([], type=pa.int64())).shape == (0,)


def test_exact_repair_fixes_forced_fib_collision(spark):
    """The 64-bit FIB window, closed end-to-end: corrupt an engine by
    inserting a NON-route key's h64 into both the FIB and the filter
    (simulating an xxhash64 collision with a stored route), confirm the
    kernel then reports the phantom depth, and verify that
    ``lookup(..., exact_repair=routes)`` restores the exact answer."""
    import numpy as np

    from ip_filter_spark.operators.lpm import PathLPM, _h64_expr, _trunc
    from pyspark.sql import functions as F

    routes = spark.createDataFrame(
        [("a", 1), ("a/b", 2)], "prefix string, depth int"
    )
    queries = spark.createDataFrame([("a/x/q1",)], "path string")
    eng = PathLPM.build(routes, num_partitions=2)

    clean = eng.lookup(queries, mode="linear").select("path", "lpm_depth", "lpm_prefix").first()
    assert clean.lpm_depth == 1 and clean.lpm_prefix == "a"

    # forge a collision: pretend the depth-2 truncation "a/x" hashes to a
    # value present in the FIB by inserting its real h64 as if it were a
    # route (FIB + all k Bloom hashes — exactly what a collision looks
    # like to the kernel)
    h = queries.select(_h64_expr(_trunc(F.col("path"), 2), 2).alias("h")).first().h
    hu = np.array([h], dtype=np.int64).view(np.uint64)
    eng.fib = np.sort(np.concatenate([eng.fib, hu]))
    eng.bf.insert_hashes(hu)

    wrong = eng.lookup(queries, mode="linear").select("lpm_depth", "lpm_prefix").first()
    assert wrong.lpm_depth == 2 and wrong.lpm_prefix == "a/x"  # phantom route

    repaired = (
        eng.lookup(queries, mode="linear", exact_repair=routes)
        .select("path", "lpm_depth", "lpm_prefix")
        .first()
    )
    assert repaired.lpm_depth == 1 and repaired.lpm_prefix == "a"
    # guided mode goes through the same repair path
    repaired_g = (
        eng.lookup(queries, mode="guided", exact_repair=routes)
        .select("lpm_depth", "lpm_prefix")
        .first()
    )
    assert repaired_g.lpm_depth == 1 and repaired_g.lpm_prefix == "a"
