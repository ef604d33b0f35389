"""Priority containers replicating the reference's sorted-set semantics.

The reference keeps matches/breaks in a Scala ``SortedSet`` whose *ordering
compares only the similarity* (FeatureCorrelation.scala:75-77 ``MatchMinOrd``,
FeatureSegmentation.scala:60-62 ``BreakMaxOrd``).  Two consequences are
observable in results and replicated here exactly:

* a tree set deduplicates by comparator equality, so a candidate whose sim
  equals an element already in the set is silently dropped, and removal
  removes *the* element with that sim;
* the comparator is ``java.lang.Float.compare`` — a total order where
  ``NaN`` sorts above ``+Inf`` (and equals itself) and ``-0.0 < 0.0``.  NaN
  sims (e.g. ``√(inSim·outSim)`` of a negative product,
  FeatureCorrelationImpl.scala:370) therefore rank as the *best* match.
  Loop gates, by contrast, use primitive IEEE comparisons where NaN is
  incomparable — callers must use raw ``sim`` floats for gates and this
  container only for ranking.
"""

from __future__ import annotations

import bisect
import struct
from typing import Generic, List, TypeVar

T = TypeVar("T")

__all__ = ["SimSortedSet", "java_float_key"]


def java_float_key(sim: float) -> int:
    """Total-order key equivalent to ``java.lang.Float.compare`` on the f32
    value: sign-adjusted IEEE-754 bits (all NaNs collapse to the canonical
    quiet NaN that JVM float arithmetic produces, so NaN == NaN > +Inf)."""
    u = struct.unpack(">I", struct.pack(">f", sim))[0]
    if (u & 0x7F800000) == 0x7F800000 and (u & 0x007FFFFF) != 0:
        u = 0x7FC00000  # canonical NaN (Float.floatToIntBits)
    # monotone unsigned key: positives shift up, negatives reverse
    return u + 0x80000000 if u < 0x80000000 else 0xFFFFFFFF - u


_key = java_float_key


class SimSortedSet(Generic[T]):
    """Bounded sorted set keyed by a float `sim`, mirroring Scala TreeSet.

    ``descending=True`` reproduces ``MatchMinOrd`` (best/highest sim at the
    head, ``last`` = lowest); ``descending=False`` reproduces ``BreakMaxOrd``
    (most dissimilar/lowest sim at the head, ``last`` = highest).
    """

    def __init__(self, descending: bool) -> None:
        self._descending = descending
        self._keys: List[int] = []   # ascending Float.compare keys
        self._items: dict = {}       # key -> item

    def __len__(self) -> int:
        return len(self._keys)

    def add(self, sim: float, item: T) -> None:
        """Insert unless an element with comparator-equal sim exists
        (TreeSet ``+=``)."""
        k = _key(sim)
        if k in self._items:
            return
        bisect.insort(self._keys, k)
        self._items[k] = item

    def remove_sim(self, sim: float) -> None:
        """Remove the element with this sim if present (TreeSet ``-=``)."""
        k = _key(sim)
        if k not in self._items:
            return
        idx = bisect.bisect_left(self._keys, k)
        del self._keys[idx]
        del self._items[k]

    # head = first in iteration order, last = the element truncation drops
    def _ordered(self) -> List[int]:
        return self._keys[::-1] if self._descending else self._keys

    @property
    def last(self) -> T:
        return self._items[self._ordered()[-1]]

    @property
    def last_sim(self) -> float:
        """Raw float sim of the last element — used by loop gates with
        primitive IEEE comparisons (may be NaN)."""
        return getattr(self.last, "sim")

    def drop_last(self) -> None:
        k = self._ordered()[-1]
        idx = bisect.bisect_left(self._keys, k)
        del self._keys[idx]
        del self._items[k]

    def truncate(self, n: int) -> None:
        """Keep the first ``n`` in iteration order (``allPrio.take(n)``)."""
        while len(self) > n:
            self.drop_last()

    def items(self) -> List[T]:
        return [self._items[k] for k in self._ordered()]

    def update(self, other: "SimSortedSet[T]") -> None:
        """``this ++= other`` (existing comparator-equal elements win)."""
        for k in other._ordered():
            item = other._items[k]
            if k not in self._items:
                bisect.insort(self._keys, k)
                self._items[k] = item
