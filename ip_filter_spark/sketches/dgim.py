"""DGIM exponential histogram — sliding-window counting in O(log² W)
space (Datar, Gionis, Indyk, Motwani, "Maintaining stream statistics
over sliding windows", SODA 2002).

Counts events in the trailing time window of an unbounded stream without
storing the events: buckets of exponentially growing sizes (1, 2, 4, …),
each carrying only (size, timestamp-of-latest-element), at most
``k + 1`` buckets per size.  Only the OLDEST still-active bucket is
uncertain — its latest element is inside the window but its earlier
elements may have expired — so the doubled estimate ``2·T + s`` (T =
sum of the younger active buckets, s = oldest active size) brackets the
true count C by a theorem, not a tail bound:

    T + 1  <=  C  <=  T + s      =>      |2C - est2x| <= s

and the k-buckets-per-size invariant keeps s <= ~C/k, i.e. relative
error <= ~1/(2k).  Everything here is integer arithmetic — the
uncertainty interval is exact in any engine.

This sketch is deliberately NOT in the mergeable registry: DGIM is
sequence-dependent (its buckets encode arrival order), so its Spark
habitat is per-key ordered processing — ``applyInPandas`` over a key
partition sorted by time in batch, ``applyInPandasWithState`` keyed by
the same column in streaming.  State per key is O(log² window-count):
thousands of keys cost megabytes, never the window's events.

No counterpart in the reference (its filters answer membership, not
recency); this covers the north rule's streaming-recency angle the same
way KLL/t-digest cover quantiles.
"""

from __future__ import annotations


class Dgim:
    """Time-based DGIM bucket chain for one stream (one key).

    ``k`` is the accuracy knob: at most ``k + 1`` buckets per size are
    kept (merging the two oldest on overflow), giving relative error
    about ``1 / (2k)``.  Timestamps are any monotonically comparable
    integers (epoch micros in the gates); inserts MUST be time-ordered.
    """

    def __init__(self, k: int = 8):
        assert k >= 1
        self.k = int(k)
        # newest-first [(size, ts_of_latest_element)]
        self.buckets: list[list[int]] = []

    def insert(self, ts: int) -> None:
        self.buckets.insert(0, [1, int(ts)])
        size = 1
        i = 0
        while True:
            # count buckets of this size (they are contiguous: sizes are
            # non-decreasing going older in a well-formed chain)
            j = i
            while j < len(self.buckets) and self.buckets[j][0] == size:
                j += 1
            if j - i <= self.k + 1:
                break
            # merge the two OLDEST of this size; the merged bucket's
            # timestamp is the NEWER of the two (its latest element)
            a = self.buckets[j - 2]
            b = self.buckets[j - 1]
            merged = [size * 2, max(a[1], b[1])]
            self.buckets[j - 2 : j] = [merged]
            i = j - 2  # the merged bucket starts the doubled-size run
            size *= 2

    def _active(self, now: int, window: int) -> list[list[int]]:
        cutoff = now - window
        return [b for b in self.buckets if b[1] > cutoff]

    def expire(self, now: int, window: int) -> None:
        """Drop fully-expired buckets (their latest element left the
        window) — keeps the chain O(log² count-in-window)."""
        self.buckets = self._active(now, window)

    def estimate2x(self, now: int, window: int) -> tuple[int, int]:
        """(doubled estimate, uncertainty) for the count of inserts with
        ts in (now - window, now]:  est2x = 2·T + s where T sums every
        active bucket except the oldest and s is the oldest active
        bucket's size.  The true count C always satisfies
        |2C - est2x| <= s (exact integer bracket — see module doc)."""
        active = self._active(now, window)
        if not active:
            return 0, 0
        s = active[-1][0]
        t = sum(b[0] for b in active[:-1])
        return 2 * t + s, s

    @property
    def n_buckets(self) -> int:
        return len(self.buckets)
