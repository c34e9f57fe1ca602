"""SpMM HBM-roofline reporter (BASELINE north star: SpMM ≥ 70 % of HBM
roofline).

Model: a COO SpMM over E edges with F float32 features moves at least
``E·F·4`` bytes of gathered rows + ``N·F·4`` bytes of output (+ index/weight
streams); the roofline time is that traffic at peak HBM bandwidth.  Peak
bandwidths per chip generation are tabulated; unknown platforms fall back to
a measured-stream estimate.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

# peak HBM bandwidth per chip, GB/s
PEAK_HBM_GBPS = {
    "tpu v4": 1228.0,
    "tpu v5 lite": 819.0,     # v5e
    "tpu v5": 2765.0,         # v5p
    "tpu v6 lite": 1640.0,    # v6e (Trillium)
    "cpu": 50.0,
}


def detect_peak_gbps() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in PEAK_HBM_GBPS.items():
        if key in kind:
            return bw
    return PEAK_HBM_GBPS.get(jax.default_backend(), 100.0)


@dataclasses.dataclass
class RooflineReport:
    seconds_per_spmm: float
    bytes_moved: float
    achieved_gbps: float
    peak_gbps: float

    @property
    def fraction_of_roofline(self) -> float:
        return self.achieved_gbps / self.peak_gbps


def measure_spmm_roofline(num_nodes: int = 131_072, avg_degree: int = 8,
                          feat: int = 512, reps: int = 20,
                          seed: int = 0) -> RooflineReport:
    rng = np.random.default_rng(seed)
    e = num_nodes * avg_degree
    senders = jnp.asarray(rng.integers(0, num_nodes, e, dtype=np.int32))
    receivers = jnp.asarray(
        np.sort(rng.integers(0, num_nodes, e, dtype=np.int32)))
    w = jnp.asarray(rng.random(e).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((num_nodes, feat)).astype(np.float32))

    @jax.jit
    def loop(w_, s_, r_, x_):
        def body(i, xc):
            out = jax.ops.segment_sum(xc[s_] * w_[:, None], r_,
                                      num_segments=num_nodes,
                                      indices_are_sorted=True)
            return out * 0.35
        return jax.lax.fori_loop(0, reps, body, x_)

    # chain the warm-up output into the timed call (remote-execution layers
    # may cache identical (program, inputs) pairs)
    warm = loop(w, senders, receivers, x)
    warm.block_until_ready()
    t0 = time.perf_counter()
    loop(w, senders, receivers, warm).block_until_ready()
    sec = (time.perf_counter() - t0) / reps

    bytes_moved = (e * feat * 4.0          # gathered rows
                   + num_nodes * feat * 4.0  # scattered output
                   + e * (4 + 4 + 4.0))      # indices + weights
    achieved = bytes_moved / sec / 1e9
    return RooflineReport(seconds_per_spmm=sec, bytes_moved=bytes_moved,
                          achieved_gbps=achieved,
                          peak_gbps=detect_peak_gbps())
