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


def test_arrow_fixed_binary_matrix_paths():
    """The mapInArrow probe's zero-copy view must agree with the object
    fallback on dense, sliced, chunked, and large-binary arrays — and
    take the fallback (not crash) when nulls or ragged widths appear."""
    import numpy as np
    import pyarrow as pa

    from ip_filter_spark.operators.lpm import _arrow_fixed_binary_matrix

    w = 8
    vals = [bytes(range(i, i + w)) for i in range(10)]
    expect = np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(10, w)

    dense = pa.array(vals, type=pa.binary())
    assert (_arrow_fixed_binary_matrix(dense, w) == expect).all()
    # sliced array: offset != 0
    assert (_arrow_fixed_binary_matrix(dense.slice(3, 5), w) == expect[3:8]).all()
    # large_binary: 64-bit offsets
    big = pa.array(vals, type=pa.large_binary())
    assert (_arrow_fixed_binary_matrix(big, w) == expect).all()
    # chunked
    chunked = pa.chunked_array([pa.array(vals[:4], type=pa.binary()), pa.array(vals[4:], type=pa.binary())])
    assert (_arrow_fixed_binary_matrix(chunked, w) == expect).all()
    # empty
    assert _arrow_fixed_binary_matrix(pa.array([], type=pa.binary()), w).shape == (0, w)
    # nulls force the fallback, which must reject ragged widths loudly
    import pytest as _pytest

    with _pytest.raises(Exception):
        _arrow_fixed_binary_matrix(pa.array([b"x" * w, None], type=pa.binary()), w)
