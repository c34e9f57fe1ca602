"""Content-hashed preprocessing-artifact cache.

The reference caches coarsening artifacts under a name built only from
(ratio, node-mode, graph-type) (``main.py:131-172``) — a stale-cache
foot-gun when the method, dataset, or code changes.  Here the key is a hash
of the inputs + configuration, so a cache entry can never be silently wrong
(SURVEY §7.3 item 7).
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Mapping, Optional

import numpy as np


def content_key(arrays: Mapping[str, np.ndarray],
                config: Mapping[str, Any]) -> str:
    h = hashlib.sha256()
    for name in sorted(arrays):
        a = np.ascontiguousarray(arrays[name])
        h.update(name.encode())
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes()[: 1 << 22])   # cap hashing cost on huge arrays
    for k in sorted(config):
        h.update(f"{k}={config[k]};".encode())
    return h.hexdigest()[:20]


class ArtifactCache:
    def __init__(self, root: str = "./artifacts_cache"):
        self.root = root

    def _path(self, key: str) -> str:
        return os.path.join(self.root, f"{key}.pkl")

    def load(self, key: str) -> Optional[Any]:
        p = self._path(key)
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            return pickle.load(f)

    def save(self, key: str, obj: Any) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._path(key) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(obj, f)
        os.replace(tmp, self._path(key))

    def load_or_compute(self, key: str, fn):
        hit = self.load(key)
        if hit is not None:
            return hit, True
        obj = fn()
        self.save(key, obj)
        return obj, False
