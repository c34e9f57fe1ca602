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


def __getattr__(name):
    """Lazy top-level API (keeps `import fitgnn_tpu` light)."""
    _API = {
        "Graph": ("fitgnn_tpu.graph", "Graph"),
        "SubgraphBatch": ("fitgnn_tpu.graph", "SubgraphBatch"),
        "build_graph": ("fitgnn_tpu.graph", "build_graph"),
        # NOTE: `coarsen` the subpackage shadows the function at top level;
        # use fitgnn_tpu.coarsen.coarsen
        "coarsen_and_partition": ("fitgnn_tpu.partition",
                                  "coarsen_and_partition"),
        "NodeModel": ("fitgnn_tpu.models", "NodeModel"),
        "GraphModel": ("fitgnn_tpu.models", "GraphModel"),
        "NodeTaskConfig": ("fitgnn_tpu.train", "NodeTaskConfig"),
        "run_node_task": ("fitgnn_tpu.train", "run_node_task"),
    }
    if name in _API:
        import importlib
        mod, attr = _API[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'fitgnn_tpu' has no attribute {name!r}")
