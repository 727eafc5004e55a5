"""Property-based checks (hypothesis) for the sketch kernels — random
key sets, random split points, random fill levels. These complement the
fixed-seed tests: the serialization format choice (dense vs sparse) and
the merge laws must hold at EVERY fill level, not just the two the
example tests happen to pick.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ip_filter_spark.sketches import (
    BloomFilter,
    CountingBloomFilter,
    CountMinSketch,
    HyperLogLog,
    from_bytes,
)
from ip_filter_spark.sketches.misra_gries import MisraGries

FAST = settings(max_examples=25, deadline=None)


def _hashes(n: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 2**64, size=n, dtype=np.uint64, endpoint=False)


@FAST
@given(n=st.integers(1, 20_000), cut=st.floats(0.0, 1.0), seed=st.integers(0, 2**31))
def test_bloom_split_merge_equals_whole_and_roundtrips(n, cut, seed):
    h = _hashes(n, seed)
    k = int(cut * n)
    whole = BloomFilter(fpp=1e-3, n=max(n, 1)).insert_hashes(h)
    a = BloomFilter(fpp=1e-3, n=max(n, 1)).insert_hashes(h[:k])
    b = BloomFilter(fpp=1e-3, n=max(n, 1)).insert_hashes(h[k:])
    # merge through serialization (exercises sparse AND dense paths
    # depending on the random fill level)
    merged = from_bytes(a.to_bytes()).merge(from_bytes(b.to_bytes()))
    assert bytes(merged.bits) == bytes(whole.bits)
    rt = from_bytes(whole.to_bytes())
    assert bytes(rt.bits) == bytes(whole.bits) and rt.n_items == whole.n_items
    assert rt.contains_hashes(h).all()  # no false negatives, ever


@FAST
@given(n=st.integers(1, 5_000), cut=st.floats(0.0, 1.0), seed=st.integers(0, 2**31))
def test_cms_never_undercounts_after_split_merge(n, cut, seed):
    h = _hashes(n, seed)
    k = int(cut * n)
    a = CountMinSketch(eps=1e-3, delta=1e-3).update_hashes(h[:k])
    b = CountMinSketch(eps=1e-3, delta=1e-3).update_hashes(h[k:])
    merged = from_bytes(a.to_bytes()).merge(from_bytes(b.to_bytes()))
    uniq, cnt = np.unique(h, return_counts=True)
    est = merged.query_hashes(uniq)
    assert (est >= cnt).all()


@FAST
@given(n=st.integers(1, 30_000), parts=st.integers(1, 6), seed=st.integers(0, 2**31))
def test_hll_merge_order_independent_bytes(n, parts, seed):
    h = _hashes(n, seed)
    chunks = np.array_split(h, parts)
    whole = HyperLogLog(p=12).update_hashes(h)
    fwd = HyperLogLog(p=12)
    for c in chunks:
        fwd.merge(HyperLogLog(p=12).update_hashes(c))
    rev = HyperLogLog(p=12)
    for c in reversed(chunks):
        rev.merge(HyperLogLog(p=12).update_hashes(c))
    assert whole.to_bytes() == fwd.to_bytes() == rev.to_bytes()


@FAST
@given(n=st.integers(1, 3_000), cut=st.floats(0.0, 1.0), seed=st.integers(0, 2**31))
def test_cbf_delete_inverts_insert_through_serialization(n, cut, seed):
    h = _hashes(n, seed)
    k = int(cut * n)
    cbf = CountingBloomFilter(fpp=1e-3, n=max(n, 1))
    cbf.update_hashes(h)
    cbf = from_bytes(cbf.to_bytes())  # random fill → dense or sparse
    cbf.remove_hashes(h[:k])
    only_rest = CountingBloomFilter(fpp=1e-3, n=max(n, 1)).update_hashes(h[k:])
    assert (cbf.counters == only_rest.counters).all()


@FAST
@given(
    data=st.lists(st.sampled_from([f"k{i}" for i in range(40)]), min_size=1, max_size=2000),
    cap=st.integers(1, 32),
    cut=st.floats(0.0, 1.0),
)
def test_misra_gries_bound_any_stream_any_split(data, cap, cut):
    arr = np.array([d.encode() for d in data], dtype=bytes)
    k = int(cut * len(arr))
    a = MisraGries(cap).update_keys(arr[:k])
    b = MisraGries(cap).update_keys(arr[k:])
    m = from_bytes(a.to_bytes()).merge(from_bytes(b.to_bytes()))
    true = {}
    for d in data:
        true[d] = true.get(d, 0) + 1
    n = len(arr)
    assert m.err <= n // (cap + 1) + 1
    for key, est, upper in m.items():
        assert est <= true[key] <= upper
    kept = {key for key, _, _ in m.items()}
    for key, c in true.items():
        if c > n / (cap + 1):
            assert key in kept


@FAST
@given(n=st.integers(1, 20_000), parts=st.integers(1, 6), seed=st.integers(0, 2**31))
def test_ddsketch_merge_order_independent_and_bounded(n, parts, seed):
    """DDSketch is a linear sketch: any split/merge order yields the
    SAME bucket counts as the bulk build, and every quantile estimate
    stays within the relative bound of the true quantile (no collapse
    at these sizes)."""
    from ip_filter_spark.sketches.ddsketch import DDSketch

    rng = np.random.default_rng(seed)
    vals = rng.lognormal(3, 2, n) * rng.choice([-1.0, 1.0], n)
    whole = DDSketch(alpha=0.02).update_values(vals)
    chunks = np.array_split(vals, parts)
    fwd = DDSketch(alpha=0.02)
    for c in chunks:
        fwd.merge(DDSketch(alpha=0.02).update_values(c))
    rev = DDSketch(alpha=0.02)
    for c in reversed(chunks):
        rev.merge(DDSketch(alpha=0.02).update_values(c))
    assert fwd.pos == whole.pos == rev.pos
    assert fwd.neg == whole.neg == rev.neg
    assert fwd.zero == whole.zero == rev.zero
    srt = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        exact = srt[int(np.floor((n - 1) * q))]
        est = float(whole.quantile(q)[0])
        assert abs(est - exact) <= 0.0202 * abs(exact) + 1e-12
