"""Device mesh helpers.

The reference has no distributed layer at all (single ``device`` global,
``run.py:20``); here scaling is first-class: a 1-D ``data`` mesh shards the
graph (nodes + their incoming edges), params stay replicated (FIT-GNN models
are small: hidden≈512, 2 layers).  Multi-host extends the same axis over a
pod slice (``jax.distributed.initialize`` + the same named axis).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"asked for {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (DATA_AXIS,))
