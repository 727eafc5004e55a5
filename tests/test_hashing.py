"""Hash-kernel tests: canonical FNV-1a vectors + vectorized == scalar."""

import numpy as np

from ip_filter_spark.sketches.hashing import (
    digests_to_matrix,
    fnv1a64,
    fnv1a64_scalar,
    km_indices,
    rehash,
    series_sha256,
)

# Published FNV-1a 64-bit test vectors (public domain, Fowler/Noll/Vo).
FNV_VECTORS = {
    b"": 0xCBF29CE484222325,
    b"a": 0xAF63DC4C8601EC8C,
    b"b": 0xAF63DF4C8601F1A5,
    b"foobar": 0x85944171F73967E8,
}


def test_fnv_scalar_vectors():
    for data, want in FNV_VECTORS.items():
        assert fnv1a64_scalar(data) == want


def test_fnv_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    keys = [rng.bytes(32) for _ in range(257)]
    mat = digests_to_matrix(keys)
    vec = fnv1a64(mat)
    for i, k in enumerate(keys):
        assert int(vec[i]) == fnv1a64_scalar(k)


def test_km_indices_law():
    """ix_i = (h1 + i*h2) % m with h2 odd."""
    h = np.array([0x0123456789ABCDEF, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    m = 1009
    ix = km_indices(h, np.arange(5), m)
    for r in range(2):
        h1 = int(h[r]) & 0xFFFFFFFF
        h2 = ((int(h[r]) >> 32) | 1) & 0xFFFFFFFFFFFFFFFF
        for i in range(5):
            assert int(ix[r, i]) == ((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % m
    assert (ix < m).all()


def test_rehash_families_differ():
    h = np.arange(1000, dtype=np.uint64)
    a, b = rehash(h, 1), rehash(h, 2)
    assert (a != b).mean() > 0.99


def test_sha256_matrix():
    from ip_filter_spark.sketches.hashing import DIGEST_W

    mat = series_sha256(["hello", "world"])
    import hashlib

    assert bytes(mat[0]) == hashlib.sha256(b"hello").digest()[:DIGEST_W]
    assert mat.shape == (2, DIGEST_W)
