"""Standard Bloom filter with partial-hash and bit-pattern APIs.

Semantics mirror the reference's filter (parameter solver
/root/reference/prototype/bloomfilter.py:16-31, partial-hash insert/probe
:55-91, pattern slot selection /root/reference/prototype/ipfilter.py:31-48,
byte-packed LSB-first bit layout /root/reference/src/bitarray/bitarray.c:7-42)
but the implementation is batch numpy over 64-bit key hashes — insert and
probe are single broadcast expressions per Arrow batch, merge is bitwise OR.

The partial-hash / pattern API is what makes the guided-LPM "in-filter
pointer" trick work: spare hash slots double as a small side channel that
encodes an integer (the best-matching-prefix index) readable by probing
hash slots [start, start+width) with keep_going semantics
(/root/reference/prototype/ipfilter.py:113-120, 211-216).
"""

from __future__ import annotations

from math import ceil, log
from typing import Any

import numpy as np

from ip_filter_spark.sketches.base import Sketch
from ip_filter_spark.sketches.hashing import km_indices


def solve_params(fpp: float, n: int, k: int | None = None, num_bits: int | None = None):
    """(k, m) from (fpp, n) — same three modes as the reference solver
    (/root/reference/prototype/bloomfilter.py:16-28):
    optimal k; given k; or raw (k, m) passthrough."""
    if k is None:
        m = ceil(-n * log(fpp) / (log(2) ** 2))
        k = ceil((m * log(2)) / n)
    elif num_bits is None:
        m = ceil(-(k * n) / (log(1.0 - fpp ** (1.0 / k))))
    else:
        assert num_bits > 0 and k > 0
        m = num_bits
    return int(k), int(m)


def choose_hash_funcs(start: int, end: int | None = None, pattern: int | None = None) -> list[int]:
    """Hash-slot selector: contiguous [start, end) or the set-bit positions
    of ``pattern`` offset by ``start`` (law per
    /root/reference/prototype/ipfilter.py:31-48)."""
    if pattern is None:
        return list(range(start, end))
    res = []
    count = 0
    while pattern:
        if pattern & 1:
            res.append(start + count)
        count += 1
        pattern >>= 1
    return res


class BloomFilter(Sketch):
    NAME = "bloom"

    def __init__(
        self,
        fpp: float = 1e-6,
        n: int = 1,
        k: int | None = None,
        num_bits: int | None = None,
        _bits: np.ndarray | None = None,
    ):
        self.fpp = float(fpp)
        self.k, self.m = solve_params(fpp, n, k, num_bits)
        self.expected_n = int(n)
        self.n_items = 0
        nbytes = (self.m + 7) // 8
        self.bits = _bits if _bits is not None else np.zeros(nbytes, dtype=np.uint8)

    # ---- core ---------------------------------------------------------
    def _ix(self, h64: np.ndarray, hashes) -> np.ndarray:
        return km_indices(h64, np.asarray(hashes, dtype=np.uint64), self.m)

    def insert_hashes(self, h64: np.ndarray, hashes=None) -> "BloomFilter":
        """Set bits at probe indices for hash slots ``hashes`` (default all k)."""
        if len(h64) == 0:
            return self
        hashes = range(self.k) if hashes is None else hashes
        ix = self._ix(h64, list(hashes)).ravel()
        np.bitwise_or.at(self.bits, (ix >> 3).astype(np.int64), (np.uint8(1) << (ix & np.uint64(7)).astype(np.uint8)))
        self.n_items += len(h64)
        return self

    update_hashes = insert_hashes

    def _probe_bits(self, h64: np.ndarray, hashes) -> np.ndarray:
        """(n, len(hashes)) uint8 bit matrix."""
        ix = self._ix(h64, list(hashes))
        byte = self.bits[(ix >> 3).astype(np.int64)]
        return (byte >> (ix & np.uint64(7)).astype(np.uint8)) & np.uint8(1)

    def contains_hashes(self, h64: np.ndarray, hashes=None) -> np.ndarray:
        """(n,) bool — AND over the probed slots (early-exit replaced by
        branchless batch probe; batching amortizes better than scalar
        short-circuit, cf. /root/reference/prototype/bloomfilter.py:88-89)."""
        if len(h64) == 0:
            return np.zeros(0, dtype=bool)
        hashes = range(self.k) if hashes is None else hashes
        return self._probe_bits(h64, hashes).all(axis=1)

    def decode(self, h64: np.ndarray, start: int, width: int) -> np.ndarray:
        """Read ``width`` slots starting at ``start`` as little-endian ints —
        the in-filter pointer read (keep_going decode, reference
        /root/reference/prototype/bloomfilter.py:90)."""
        bits = self._probe_bits(h64, range(start, start + width))
        weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
        return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)

    def encode_pattern(self, h64: np.ndarray, start: int, patterns: np.ndarray) -> "BloomFilter":
        """Vectorized pattern insert: for row r set slots
        {start + j : bit j of patterns[r]} — the pointer write
        (/root/reference/prototype/ipfilter.py:118-120), batched.

        patterns: (n,) uint64.
        """
        if len(h64) == 0:
            return self
        patterns = patterns.astype(np.uint64)
        width = int(patterns.max()).bit_length() if len(patterns) else 0
        if width == 0:
            return self
        ix = self._ix(h64, range(start, start + width))  # (n, width)
        j = np.arange(width, dtype=np.uint64)
        mask = ((patterns[:, None] >> j[None, :]) & np.uint64(1)).astype(bool)
        sel = ix[mask]
        np.bitwise_or.at(self.bits, (sel >> 3).astype(np.int64), (np.uint8(1) << (sel & np.uint64(7)).astype(np.uint8)))
        return self

    # ---- merge / io -----------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k, "incompatible Bloom params"
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_items += other.n_items
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).sum()) / float(self.m)

    def cardinality_estimate(self) -> float:
        """Distinct insertions estimated FROM THE BIT ARRAY ALONE —
        Swamidass & Baldi (J. Chem. Inf. Model. 2007):
        n̂ = −(m/k)·ln(1 − X/m) with X the popcount.  The operational
        'how full is this deployed filter' probe when re-counting the
        corpus would be a full re-scan; exact as X/m → 0, and still
        within a few percent near design fill.  Returns +inf for a
        saturated array (every bit set carries no information)."""
        x = float(np.unpackbits(self.bits).sum())
        if x >= self.m:
            return float("inf")
        return -(self.m / self.k) * float(np.log1p(-x / self.m))

    def _params(self) -> dict[str, Any]:
        return {"fpp": self.fpp, "k": self.k, "m": self.m, "expected_n": self.expected_n}

    def _arrays(self) -> dict[str, np.ndarray]:
        # content-adaptive serialization: a low-fill filter (every
        # per-partition PARTIAL at scale — P partials each see n/P keys)
        # ships the set-bit indices instead of the dense bitmap. At 1000
        # executors the merge traffic is O(P · blob), so sparse partials
        # cut shuffle bytes by the fill factor. Format choice is a pure
        # function of the bit content — identical filters serialize
        # identically regardless of build path.
        set_ix = np.flatnonzero(np.unpackbits(self.bits, bitorder="little"))
        ix_dt = np.uint32 if self.m <= 0xFFFFFFFF else np.int64
        if len(set_ix) * np.dtype(ix_dt).itemsize < len(self.bits):
            return {"sparse_ix": set_ix.astype(ix_dt)}
        return {"bits": self.bits}

    @classmethod
    def _from_state(cls, params: dict, arrays: dict[str, np.ndarray]) -> "BloomFilter":
        if "sparse_ix" in arrays:
            ix = arrays["sparse_ix"].astype(np.int64)
            dense = np.zeros(((params["m"] + 7) // 8) * 8, dtype=np.uint8)
            dense[ix] = 1
            bits = np.packbits(dense, bitorder="little")
        else:
            bits = arrays["bits"]
        obj = cls(fpp=params["fpp"], n=params["expected_n"], k=params["k"], num_bits=params["m"], _bits=bits)
        return obj

    def __repr__(self):
        return (
            f"BloomFilter(fpp={self.fpp:g}, k={self.k}, m={self.m}, "
            f"n_items={self.n_items}, fill={self.fill_ratio():.4f})"
        )
