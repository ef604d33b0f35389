"""Priority containers replicating the reference's sorted-set semantics.

The reference keeps matches/breaks in a Scala ``SortedSet`` whose *ordering
compares only the similarity* (FeatureCorrelation.scala:75-77 ``MatchMinOrd``,
FeatureSegmentation.scala:60-62 ``BreakMaxOrd``).  A tree set deduplicates by
comparator equality, so a candidate whose sim equals an element already in
the set is silently dropped, and removal removes *the* element with that sim.
These quirks are observable in results and are replicated here exactly.
"""

from __future__ import annotations

import bisect
from typing import Any, Generic, List, Optional, TypeVar

T = TypeVar("T")

__all__ = ["SimSortedSet"]


class SimSortedSet(Generic[T]):
    """Bounded sorted set keyed by a float `sim`, mirroring Scala TreeSet.

    ``descending=True`` reproduces ``MatchMinOrd`` (best/highest sim at the
    head, ``last`` = lowest); ``descending=False`` reproduces ``BreakMaxOrd``
    (most dissimilar/lowest sim at the head, ``last`` = highest).
    """

    def __init__(self, descending: bool) -> None:
        self._descending = descending
        self._sims: List[float] = []   # ascending keys
        self._items: dict = {}         # sim -> item

    def __len__(self) -> int:
        return len(self._sims)

    def __contains__(self, sim: float) -> bool:
        return sim in self._items

    def add(self, sim: float, item: T) -> None:
        """Insert unless an element with equal sim exists (TreeSet `+=`)."""
        sim = float(sim)
        if sim in self._items:
            return
        bisect.insort(self._sims, sim)
        self._items[sim] = item

    def remove_sim(self, sim: float) -> None:
        """Remove the element with this sim if present (TreeSet `-=`)."""
        sim = float(sim)
        if sim not in self._items:
            return
        idx = bisect.bisect_left(self._sims, sim)
        del self._sims[idx]
        del self._items[sim]

    # head = first in iteration order, last = the element truncation drops
    def _ordered(self) -> List[float]:
        return self._sims[::-1] if self._descending else self._sims

    @property
    def last(self) -> T:
        return self._items[self._ordered()[-1]]

    @property
    def last_sim(self) -> float:
        return self._ordered()[-1]

    def drop_last(self) -> None:
        self.remove_sim(self._ordered()[-1])

    def truncate(self, n: int) -> None:
        """Keep the first ``n`` in iteration order (``allPrio.take(n)``)."""
        while len(self) > n:
            self.drop_last()

    def items(self) -> List[T]:
        return [self._items[s] for s in self._ordered()]

    def update(self, other: "SimSortedSet[T]") -> None:
        """``this ++= other`` (duplicate sims in ``self`` win, as in TreeSet)."""
        for s in other._ordered():
            self.add(s, other._items[s])
