"""ICWS weighted MinHash — consistent sampling for weighted Jaccard
(Sergey Ioffe, "Improved Consistent Sampling, Weighted Minhash and L1
Sketching", ICDM 2010).

Plain MinHash (``sketches/minhash.py``) estimates SET Jaccard — every
shingle counts once.  Real corpora are multisets: term frequencies,
click counts, weighted features.  The weighted Jaccard

    J_w(A, B) = Σ_t min(a_t, b_t) / Σ_t max(a_t, b_t)

is the right near-dup/similarity measure there, and ICWS samples it
consistently: for each of H independent hash slots it draws one
(feature, t) pair per weighted set such that two sets collide on slot j
with probability exactly J_w.  The signature is H 64-bit sample ids;
the estimator is the fraction of equal slots — mergeable per document
(signatures concatenate into LSH bands exactly like plain MinHash) and
embarrassingly parallel per row.

All randomness derives from the feature's 64-bit key hash via the
splitmix64 ``rehash`` family (5 independent uniform streams per slot),
so signatures are deterministic across runs, partitions and machines —
the property every distributed dedup pass needs.

Spark shape: per-document kernel over (term-digest, weight) rows —
``applyInPandas`` grouped by doc (batch) with digests computed JVM-side
by ``engine.sha256_digest``; O(F·H) numpy per doc, no cross-doc state.
No counterpart in the reference (its filters are unweighted membership).
"""

from __future__ import annotations

import numpy as np

from ip_filter_spark.sketches.hashing import rehash

_U53 = np.float64(1.0 / (1 << 53))


def _uniform(h64: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic U(0,1) stream ``salt`` for each feature hash,
    bounded away from 0 so logs stay finite."""
    u = (rehash(h64, salt) >> np.uint64(11)).astype(np.float64) * _U53
    return np.clip(u, 1e-12, 1.0 - 1e-16)


def icws_signature(h64: np.ndarray, weights: np.ndarray, num_hashes: int = 128, seed: int = 0) -> np.ndarray:
    """(num_hashes,) int64 ICWS signature of the weighted set
    {feature h64[i] with weight weights[i] > 0}.

    Per slot j, Ioffe's sampler: r, c ~ Gamma(2,1), beta ~ U(0,1) keyed
    by (feature, j, seed); t_f = floor(ln w_f / r_f + beta_f);
    ln a_f = ln c_f − r_f·(t_f − beta_f) − r_f; the slot's sample is the
    argmin-a feature mixed with its t (both determine the collision).
    P(slot equal across two sets) = J_w exactly."""
    h64 = np.asarray(h64, dtype=np.uint64)
    w = np.asarray(weights, dtype=np.float64)
    keep = w > 0
    h64, w = h64[keep], w[keep]
    if len(h64) == 0:
        return np.full(num_hashes, -1, dtype=np.int64)
    logw = np.log(w)
    out = np.empty(num_hashes, dtype=np.int64)
    for j in range(num_hashes):
        base = seed * 1_000_003 + j * 5
        r = -(np.log(_uniform(h64, base)) + np.log(_uniform(h64, base + 1)))
        c = -(np.log(_uniform(h64, base + 2)) + np.log(_uniform(h64, base + 3)))
        beta = _uniform(h64, base + 4)
        t = np.floor(logw / r + beta)
        ln_a = np.log(c) - r * (t - beta) - r
        k = int(np.argmin(ln_a))
        # sample id = (feature, t_k) mixed into one 64-bit word
        with np.errstate(over="ignore"):
            tk = np.int64(t[k]).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        out[j] = np.int64(rehash(h64[k : k + 1] ^ tk, j + 1)[0])
    return out


def icws_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of equal slots — unbiased estimator of J_w."""
    sig_a = np.asarray(sig_a)
    sig_b = np.asarray(sig_b)
    assert sig_a.shape == sig_b.shape
    return float(np.mean(sig_a == sig_b))
