"""Param-keyed TTL result cache — the engine twin of the reference's
memcache layer (trends/listing/service.go:78-124).

The reference caches gob-encoded query results under the key
"{fromMs}-{toMs}-{curFrom}-{curTo}" with a 60 s TTL (service.go:83,118)
and falls through to the database on any cache error.  ``df.persist()``
can't express this (it is plan-keyed, not parameter-keyed), so the
cache sits above ``collect()``: same keying, same TTL semantics, same
read-through behavior.  Size-bounded LRU eviction guards the driver
heap (results are small aggregates by construction — the reference's
are, too).
"""

from __future__ import annotations

import time
from collections import OrderedDict
from threading import Lock

DEFAULT_TTL_S = 60.0  # trends/listing/service.go:118


class ResultCache:
    def __init__(self, ttl_s: float = DEFAULT_TTL_S, max_entries: int = 1024,
                 clock=time.monotonic):
        self.ttl_s = ttl_s
        self.max_entries = max_entries
        self._clock = clock
        self._lock = Lock()
        self._data: OrderedDict[str, tuple[float, object]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key(*parts) -> str:
        """Composite key, mirroring service.go:83."""
        return "-".join(str(p) for p in parts)

    def get(self, key: str):
        with self._lock:
            entry = self._data.get(key)
            if entry is None:
                self.misses += 1
                return None
            expires, value = entry
            if self._clock() >= expires:
                del self._data[key]
                self.misses += 1
                return None
            self._data.move_to_end(key)
            self.hits += 1
            return value

    def put(self, key: str, value) -> None:
        with self._lock:
            self._data[key] = (self._clock() + self.ttl_s, value)
            self._data.move_to_end(key)
            while len(self._data) > self.max_entries:
                self._data.popitem(last=False)

    def get_or_compute(self, key: str, compute):
        """Read-through (service.go:86-97): hit -> cached rows; miss ->
        run query, write back, return."""
        cached = self.get(key)
        if cached is not None:
            return cached
        value = compute()
        self.put(key, value)
        return value
