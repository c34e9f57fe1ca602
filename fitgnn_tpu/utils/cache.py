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


def _to_host(obj: Any) -> Any:
    """Replace every jax array in a pytree with its numpy value before
    pickling.  Pickled ``jax.Array``s re-``device_put`` themselves at LOAD
    time — at products scale that eagerly pushes a multi-GB artifact to the
    accelerator (and fails outright when the artifact is opened on a
    host-only process); numpy leaves stay on host until a jit consumes
    them.  Recursion handles the artifact types jax's tree_map cannot
    traverse (plain dataclasses like PartitionedDataset/CoarseData)."""
    import dataclasses

    import jax

    if isinstance(obj, jax.Array):
        return np.asarray(obj)
    if isinstance(obj, tuple):
        vals = [_to_host(v) for v in obj]
        return type(obj)(*vals) if hasattr(obj, "_fields") \
            else type(obj)(vals)
    if isinstance(obj, list):
        return [_to_host(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _to_host(v) for k, v in obj.items()}
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return dataclasses.replace(obj, **{
            f.name: _to_host(getattr(obj, f.name))
            for f in dataclasses.fields(obj) if f.init})
    return obj


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
            pickle.dump(_to_host(obj), f)
        os.replace(tmp, self._path(key))

    def load_or_compute(self, key: str, fn):
        hit = self.load(key)
        if hit is not None:
            return hit, True
        obj = fn()
        self.save(key, obj)
        return obj, False
