"""Boundary-only halo exchange: parity with the all-gather model."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.parallel import (
    make_mesh, shard_graph, DistNodeModel, create_dist_state, DATA_AXIS,
)
from fitgnn_tpu.parallel.dist_model import DistNodeModelHalo
from fitgnn_tpu.parallel.halo import build_halo_plan, halo_exchange


def setup(n=256, p=4, seed=0):
    x, s, r, y = sbm_graph(num_nodes=n, num_classes=3, num_features=16,
                           p_in=0.08, p_out=0.01, seed=seed)
    sg = shard_graph(x, s, r, y, p)
    plan = build_halo_plan(np.asarray(sg.senders), np.asarray(sg.receivers),
                           np.asarray(sg.edge_weight), p, sg.nodes_per_shard)
    return sg, plan, p


class TestHaloPlan:
    def test_sender_remap_consistency(self):
        sg, plan, p = setup()
        n_loc = sg.nodes_per_shard
        k = plan.k
        s_glob = np.asarray(sg.senders)
        s_ext = np.asarray(plan.senders_ext)
        send_idx = np.asarray(plan.send_idx)
        for q in range(p):
            for e in range(s_glob.shape[1]):
                g = s_glob[q, e]
                owner, local = g // n_loc, g % n_loc
                ext = s_ext[q, e]
                if owner == q:
                    assert ext == local
                else:
                    slot = ext - n_loc
                    src_shard, pos = slot // k, slot % k
                    assert src_shard == owner
                    assert send_idx[owner, q, pos] == local

    def test_halo_exchange_rows(self):
        """Exchanged rows must equal the remote shards' actual rows."""
        sg, plan, p = setup()
        mesh = make_mesh(p)
        n_loc = sg.nodes_per_shard
        f = 16

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(DATA_AXIS), P(DATA_AXIS),
                                     P(DATA_AXIS)),
                           out_specs=P(DATA_AXIS), check_vma=False)
        def run(h, send_idx, send_mask):
            halo = halo_exchange(h[0], send_idx[0], send_mask[0], DATA_AXIS)
            return halo[None]

        h = jnp.arange(p * n_loc * f, dtype=jnp.float32).reshape(p, n_loc, f)
        with mesh:
            halo = np.asarray(run(h, plan.send_idx, plan.send_mask))
        k = plan.k
        send_idx = np.asarray(plan.send_idx)
        send_mask = np.asarray(plan.send_mask)
        h_np = np.asarray(h)
        for q in range(p):
            for src in range(p):
                for j in range(k):
                    if send_mask[src, q, j]:
                        np.testing.assert_allclose(
                            halo[q, src * k + j],
                            h_np[src, send_idx[src, q, j]])


class TestHaloModelParity:
    def test_matches_allgather_model(self):
        sg, plan, p = setup()
        mesh = make_mesh(p)
        model_ag = DistNodeModel(hidden=16, num_layers=2, out_dim=3)
        state = create_dist_state(model_ag, jax.random.PRNGKey(0), sg)
        model_halo = DistNodeModelHalo(hidden=16, num_layers=2, out_dim=3)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
        def fwd(params, x, s_glob, s_ext, recv, w, send_idx, send_mask):
            out_ag = model_ag.apply(params, x[0], s_glob[0], recv[0], w[0])
            out_halo = model_halo.apply(params, x[0], s_ext[0], recv[0],
                                        w[0], send_idx[0], send_mask[0])
            return out_ag[None], out_halo[None]

        with mesh:
            out_ag, out_halo = fwd(
                state.params, sg.x, sg.senders, plan.senders_ext,
                plan.receivers, plan.edge_weight, plan.send_idx,
                plan.send_mask)
        np.testing.assert_allclose(np.asarray(out_halo), np.asarray(out_ag),
                                   rtol=1e-5, atol=1e-5)
