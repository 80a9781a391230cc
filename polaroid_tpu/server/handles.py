"""Handle registry: uuid -> frame with TTL + touch-on-access.

Capability analogue of the reference's HandleManager
(`polarway-grpc/src/handles.rs:41-80`): clients hold 36-byte handles;
intermediate results never cross the wire; expired handles are reclaimed
lazily so leaked client sessions don't pin server memory.
"""

from __future__ import annotations

import threading
import time
import uuid
from typing import Dict, List, Optional

from ..errors import ComputeError

DEFAULT_TTL_S = 3600.0


class _Entry:
    __slots__ = ("frame", "created", "last_access")

    def __init__(self, frame):
        self.frame = frame
        self.created = time.time()
        self.last_access = self.created


class HandleManager:
    def __init__(self, ttl_s: float = DEFAULT_TTL_S):
        self._entries: Dict[str, _Entry] = {}
        self._lock = threading.Lock()
        self._ttl = ttl_s

    def create(self, frame) -> str:
        h = str(uuid.uuid4())
        with self._lock:
            self._entries[h] = _Entry(frame)
        return h

    def get(self, handle: str):
        with self._lock:
            self._reap_locked()
            e = self._entries.get(handle)
            if e is None:
                raise ComputeError(f"unknown or expired handle {handle!r}")
            e.last_access = time.time()
            return e.frame

    def release(self, handle: str) -> bool:
        with self._lock:
            return self._entries.pop(handle, None) is not None

    def list(self) -> List[str]:
        with self._lock:
            self._reap_locked()
            return sorted(self._entries)

    def __len__(self) -> int:
        with self._lock:
            return len(self._entries)

    def _reap_locked(self) -> None:
        now = time.time()
        dead = [h for h, e in self._entries.items()
                if now - e.last_access > self._ttl]
        for h in dead:
            del self._entries[h]
