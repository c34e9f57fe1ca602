"""fitgnn_tpu — a TPU-native graph-neural-network framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the FIT-GNN
reference (coarsening-accelerated GNN training + fast subgraph inference),
re-designed TPU-first:

- ``ops``       segment/scatter primitives, SpMM/SDDMM (XLA + Pallas BCSR kernels)
- ``graph``     immutable padded array graph containers (JIT-stable shapes)
- ``coarsen``   spectral graph coarsening (variation/*, algebraic_JC, affinity_GS, kron)
- ``partition`` metanode subgraph extraction (plain / halo / cluster-summary modes)
- ``models``    GCN/GAT/SAGE/GIN layers + node/graph task heads (flax)
- ``train``     jitted train/eval steps, experiment setups, checkpointing
- ``parallel``  mesh construction, sharded training, halo exchange collectives
- ``data``      dataset loaders, synthetic generators, split generators
"""

__version__ = "0.1.0"
