"""Hierarchical halo exchange: exact boundary rows over ICI within a host
group, cluster-summary rows over DCN between host groups, with the local
(interior) aggregation structured to overlap both collectives.

This is the reference's ``cluster_node`` mechanism (``utils.py:191-232`` —
coarse-cluster features ``C·X`` standing in for remote context) promoted to a
hierarchical collective (SURVEY §2.4):

* edges whose sender lives on the same shard      → aggregated locally,
  **before** any collective completes (XLA can overlap the in-flight
  ``all_to_all``/``all_gather`` with this segment-sum because there is no
  data dependency);
* edges whose sender lives on another shard of the SAME host group
  → exact 1-hop halo rows moved by one ``all_to_all`` over the ``chip``
  (ICI) axis — the ``extra_node`` semantics (``utils.py:235-239``);
* edges whose sender lives on a REMOTE host group  → redirected to that
  sender's cluster-summary row (mean, or the reference's ``C·X`` partial
  isometry) — summaries are recomputed from the current layer's activations
  and ``all_gather``'d over the (``host``, ``chip``) axes, so only
  ``n_clusters·F`` bytes cross DCN instead of the full boundary.

With ``num_hosts == 1`` there are no summary edges and the layer computes
the EXACT sharded GCN aggregation — it is then the overlap-split version of
``DistGCNConvHalo``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from fitgnn_tpu.ops.segment import segment_sum

HOST_AXIS = "host"
CHIP_AXIS = "chip"


@flax.struct.dataclass
class HierPlan:
    """Static exchange plan for a (num_hosts × chips_per_host) mesh.

    Shard ``p`` sits at (host ``p // D``, chip ``p % D``).  All leading axes
    are the shard axis P = H·D; edges are split three ways per shard.
    """

    # interior edges: sender and receiver local to the shard
    int_senders: jnp.ndarray      # (P, Ei) local row ids
    int_receivers: jnp.ndarray    # (P, Ei) local row ids
    int_weights: jnp.ndarray      # (P, Ei)
    # same-host halo edges: sender indexes the (D·K, F) halo table
    halo_senders: jnp.ndarray     # (P, Eh) index into halo table
    halo_receivers: jnp.ndarray   # (P, Eh) local row ids
    halo_weights: jnp.ndarray     # (P, Eh)
    send_idx: jnp.ndarray         # (P, D, K) local rows sent to same-host peers
    send_mask: jnp.ndarray        # (P, D, K) bool
    # remote-host edges: sender indexes the (P·C, F) summary table
    sum_senders: jnp.ndarray      # (P, Es) index into summary table
    sum_receivers: jnp.ndarray    # (P, Es) local row ids
    sum_weights: jnp.ndarray      # (P, Es)
    # cluster membership (for building the summaries each layer)
    cluster_local: jnp.ndarray    # (P, n_loc) local cluster slot; C = padding
    cluster_scale: jnp.ndarray    # (P, C) per-cluster scale (1/n or 1/√n)
    num_hosts: int = flax.struct.field(pytree_node=False)
    chips_per_host: int = flax.struct.field(pytree_node=False)
    # optional per-shard hybrid BCSR+selector structures for the INTERIOR
    # aggregation (leading shard axis on every leaf): the same MXU operator
    # the single-chip path runs, so sharded layers stop paying XLA's
    # per-edge scatter for the ~85 % of edges that are shard-local
    int_hybrid: object = None

    @property
    def num_shards(self) -> int:
        return self.int_senders.shape[0]

    @property
    def clusters_per_shard(self) -> int:
        return self.cluster_scale.shape[1]

    @property
    def halo_k(self) -> int:
        return self.send_idx.shape[-1]


def _pad2(rows, fill, width, dtype):
    out = np.full((len(rows), width), fill, dtype=dtype)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def _pad_tail(a, n, fill_last: bool = False):
    """Pad array ``a`` to length ``n`` along axis 0 (zeros, or repeating the
    last element to preserve sorted runs)."""
    a = np.asarray(a)
    if a.shape[0] >= n:
        return a
    pad = n - a.shape[0]
    if fill_last and a.shape[0]:
        tail = np.repeat(a[-1:], pad, axis=0)
    else:
        tail = np.zeros((pad,) + a.shape[1:], dtype=a.dtype)
    return np.concatenate([a, tail], axis=0)


def _stack_shard_hybrids(ints, intr, intw, n_loc, min_block_edges=150,
                         semantics: str = "gcn_norm",
                         interior_cluster: int = 0,
                         interior_cluster_exact: int = 0):
    """Build per-shard hybrid operators for the interior edge lists and
    stack them (uniform leaf shapes, leading shard axis) so the structure
    shards over the mesh like every other HierPlan leaf.

    Padding invariants: BSR pads with zero tiles repeating the LAST row id
    (same-row run → no spurious re-init, zero contribution); segmm pads
    with zero-weight chunks repeating the last group id; COO lists pad
    zero-weight edges repeating the last receiver (sortedness preserved).

    ``semantics='att_unit'`` builds GAT presence structures (consumed by
    ``tile_gat_attention`` partials in ``hier_attention_aggregate``); the
    per-shard ``dyn_plan`` is skipped (its ragged walk plans don't stack;
    the XLA einsum tile path applies instead) and segmm stays off (the
    straggler numerator path with the best measured backward at GAT widths
    is the y-reuse augmented scatter).
    """
    import jax.tree_util as jtu
    from fitgnn_tpu.ops.hybrid_spmm import build_hybrid

    att = semantics == "att_unit"
    n_pad = -(-n_loc // 128) * 128
    # intra-shard straggler collapse (VERDICT r4 ask #4): each shard's
    # straggler edges aggregate/attend onto LOCAL contiguous-K cluster
    # summaries — the single-chip collapse per shard, composed with the
    # cross-host summary exchange this plan already performs
    ck = dict(cluster_att=interior_cluster if att else 0,
              cluster_att_exact=interior_cluster_exact if att else 0,
              cluster_agg=0 if att else interior_cluster,
              cluster_agg_exact=0 if att else interior_cluster_exact,
              real_nodes=n_loc)
    hybs = [build_hybrid(np.asarray(s, np.int64), np.asarray(r, np.int64),
                         np.asarray(w, np.float32), n_pad,
                         min_block_edges=min_block_edges, use_segmm=not att,
                         semantics=semantics, build_dyn=False, **ck)
            for s, r, w in zip(ints, intr, intw)]
    # uniform pytree structure across shards: a shard with no dense tile
    # gets a filler-only BSR (zero tiles, full row coverage — inert)
    from fitgnn_tpu.ops.pallas.bsr_spmm import build_bsr
    hybs = [h if h.bsr is not None else h.replace(bsr=build_bsr(
                np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float32), n_pad))
            for h in hybs]

    def pad_bsr(b, kt):
        blocks = _pad_tail(np.asarray(b.blocks), kt)
        rows = _pad_tail(np.asarray(b.rows), kt, fill_last=True)
        cols = _pad_tail(np.asarray(b.cols), kt, fill_last=True)
        return b.replace(blocks=jnp.asarray(blocks), rows=jnp.asarray(rows),
                         cols=jnp.asarray(cols))

    def pad_segmm(m, nc, ne_real):
        chunk = m.aux.shape[-1]
        return m.replace(
            block_ids=jnp.asarray(_pad_tail(np.asarray(m.block_ids), nc,
                                            fill_last=True)),
            aux=jnp.asarray(_pad_tail(np.asarray(m.aux), nc)),
            senders=jnp.asarray(_pad_tail(np.asarray(m.senders),
                                          nc * chunk)),
            first_slot=jnp.asarray(_pad_tail(np.asarray(m.first_slot),
                                             ne_real)),
            edge_ids=jnp.asarray(_pad_tail(np.asarray(m.edge_ids),
                                           nc * chunk)))

    kf = max(int(h.bsr.nnz_blocks) for h in hybs)
    kt = max(int(h.bsr.transpose.nnz_blocks) for h in hybs)
    ne = max(int(h.num_coo_edges) for h in hybs)
    if not att:
        ncf = max(int(h.segmm.num_chunks) for h in hybs)
        nct = max(int(h.t_segmm.num_chunks) for h in hybs)
        nfs = max(int(h.segmm.first_slot.shape[0]) for h in hybs)
        nfst = max(int(h.t_segmm.first_slot.shape[0]) for h in hybs)

    padded = []
    for h in hybs:
        bsr = pad_bsr(h.bsr, kf).replace(
            transpose=pad_bsr(h.bsr.transpose, kt))
        padded.append(h.replace(
            bsr=bsr,
            segmm=None if att else pad_segmm(h.segmm, ncf, nfs),
            t_segmm=None if att else pad_segmm(h.t_segmm, nct, nfst),
            senders=jnp.asarray(_pad_tail(np.asarray(h.senders), ne,
                                          fill_last=True)),
            receivers=jnp.asarray(_pad_tail(np.asarray(h.receivers), ne,
                                            fill_last=True)),
            weights=jnp.asarray(_pad_tail(np.asarray(h.weights), ne)),
            t_senders=jnp.asarray(_pad_tail(np.asarray(h.t_senders), ne,
                                            fill_last=True)),
            t_receivers=jnp.asarray(_pad_tail(np.asarray(h.t_receivers), ne,
                                              fill_last=True)),
            t_weights=jnp.asarray(_pad_tail(np.asarray(h.t_weights), ne)),
            t_edge_perm=jnp.asarray(_pad_tail(np.asarray(h.t_edge_perm), ne,
                                              fill_last=True))))
    return jtu.tree_map(lambda *xs: jnp.stack(xs), *padded)


def build_hier_plan(senders_global: np.ndarray, receivers_local: np.ndarray,
                    edge_weight: np.ndarray, num_hosts: int,
                    chips_per_host: int, nodes_per_shard: int,
                    cluster_of: np.ndarray, summary: str = "mean",
                    pad_to: int = 8,
                    interior_hybrid: bool = True,
                    min_block_edges: int = 150,
                    interior_semantics: str = "gcn_norm",
                    interior_cluster: int = 0,
                    interior_cluster_exact: int = 0) -> HierPlan:
    """Build the three-way edge split + exchange tables (host-side).

    ``senders_global``/``receivers_local``/``edge_weight``: the
    ``ShardedGraph`` layout — (P, E) with global senders, local receivers.
    ``cluster_of``: (N_global,) cluster id per node; every cluster must live
    entirely on one shard (community-contiguous placement guarantees this).
    ``summary``: "mean" (Σx/n) or "isometry" (the reference's C·X rows,
    Σx/√n — ``coarsening_utils.py:238``).
    """
    P = num_hosts * chips_per_host
    assert senders_global.shape[0] == P, (senders_global.shape, P)
    n_loc = nodes_per_shard
    D = chips_per_host
    s_all = np.asarray(senders_global, dtype=np.int64)
    r_all = np.asarray(receivers_local, dtype=np.int64)
    w_all = np.asarray(edge_weight)
    cluster_of = np.asarray(cluster_of, dtype=np.int64)
    n_global = len(cluster_of)

    # per-shard cluster slot tables (clusters are shard-contiguous)
    shard_clusters = []      # sorted unique cluster ids per shard
    for p in range(P):
        lo, hi = p * n_loc, min((p + 1) * n_loc, n_global)
        ids = np.unique(cluster_of[lo:hi]) if hi > lo else np.empty(0, np.int64)
        shard_clusters.append(ids)
    owner_of_cluster = np.full(int(cluster_of.max()) + 1 if n_global else 1,
                               -1, dtype=np.int64)
    for p, ids in enumerate(shard_clusters):
        for c in ids:
            if owner_of_cluster[c] not in (-1, p):
                raise ValueError(
                    f"cluster {c} spans shards {owner_of_cluster[c]} and {p}"
                    " — use community-contiguous node ordering")
            owner_of_cluster[c] = p
    C = max((len(i) for i in shard_clusters), default=1)
    C = max(((C + pad_to - 1) // pad_to) * pad_to, pad_to)

    cluster_local = np.full((P, n_loc), C, dtype=np.int32)  # C = padding slot
    cluster_scale = np.zeros((P, C), dtype=np.float32)
    for p, ids in enumerate(shard_clusters):
        lo, hi = p * n_loc, min((p + 1) * n_loc, n_global)
        if hi <= lo:
            continue
        slots = np.searchsorted(ids, cluster_of[lo:hi])
        cluster_local[p, : hi - lo] = slots
        counts = np.bincount(slots, minlength=C).astype(np.float32)
        nz = counts > 0
        cluster_scale[p, nz] = (1.0 / counts[nz] if summary == "mean"
                                else 1.0 / np.sqrt(counts[nz]))

    # halo need lists (same-host pairs only)
    need = [[None] * D for _ in range(P)]   # need[q][d] = rows from chip d
    for q in range(P):
        h = q // D
        owner = s_all[q] // n_loc
        for d in range(D):
            p = h * D + d
            if p == q:
                need[q][d] = np.empty(0, np.int64)
                continue
            rows = np.unique(s_all[q][owner == p]) % n_loc
            need[q][d] = rows
    k = max((len(need[q][d]) for q in range(P) for d in range(D)), default=1)
    k = max(((k + pad_to - 1) // pad_to) * pad_to, pad_to)

    send_idx = np.zeros((P, D, k), dtype=np.int32)
    send_mask = np.zeros((P, D, k), dtype=bool)
    for p in range(P):
        hp, dp = p // D, p % D
        for d in range(D):
            q = hp * D + d
            if q == p:
                continue
            rows = need[q][dp]
            send_idx[p, d, : len(rows)] = rows
            send_mask[p, d, : len(rows)] = True

    # three-way edge split per shard
    ints, intr, intw = [], [], []
    has_, har_, haw_ = [], [], []
    sus_, sur_, suw_ = [], [], []
    for q in range(P):
        hq = q // D
        s, r, w = s_all[q], r_all[q], w_all[q]
        owner = s // n_loc
        local = owner == q
        samehost = (owner // D == hq) & ~local
        remote = ~local & ~samehost

        ints.append(s[local] % n_loc)
        intr.append(r[local])
        intw.append(w[local])

        sh = s[samehost]
        oh = owner[samehost]
        ext = np.zeros(len(sh), dtype=np.int64)
        for d in range(D):
            p = hq * D + d
            sel = oh == p
            if not sel.any():
                continue
            pos = np.searchsorted(need[q][d], sh[sel] % n_loc)
            ext[sel] = d * k + pos
        has_.append(ext)
        har_.append(r[samehost])
        haw_.append(w[samehost])

        sr = s[remote]
        orm = owner[remote]
        slot = np.zeros(len(sr), dtype=np.int64)
        for pv in np.unique(orm):          # vectorized per owner shard
            sel = orm == pv
            slot[sel] = pv * C + np.searchsorted(shard_clusters[pv],
                                                 cluster_of[sr[sel]])
        sus_.append(slot)
        sur_.append(r[remote])
        suw_.append(w[remote])

    def pad_edges(s_lists, r_lists, w_lists):
        e = max(max((len(a) for a in s_lists), default=0), 1)
        e = ((e + pad_to - 1) // pad_to) * pad_to
        return (_pad2(s_lists, 0, e, np.int32),
                _pad2(r_lists, n_loc - 1, e, np.int32),
                _pad2(w_lists, 0.0, e, np.float32))

    is_, ir_, iw_ = pad_edges(ints, intr, intw)
    hs_, hr_, hw_ = pad_edges(has_, har_, haw_)
    ss_, sr2, sw_ = pad_edges(sus_, sur_, suw_)

    int_hybrid = (_stack_shard_hybrids(
                      ints, intr, intw, n_loc,
                      min_block_edges=min_block_edges,
                      semantics=interior_semantics,
                      interior_cluster=interior_cluster,
                      interior_cluster_exact=interior_cluster_exact)
                  if interior_hybrid else None)

    return HierPlan(
        int_hybrid=int_hybrid,
        int_senders=jnp.asarray(is_), int_receivers=jnp.asarray(ir_),
        int_weights=jnp.asarray(iw_),
        halo_senders=jnp.asarray(hs_), halo_receivers=jnp.asarray(hr_),
        halo_weights=jnp.asarray(hw_),
        send_idx=jnp.asarray(send_idx), send_mask=jnp.asarray(send_mask),
        sum_senders=jnp.asarray(ss_), sum_receivers=jnp.asarray(sr2),
        sum_weights=jnp.asarray(sw_),
        cluster_local=jnp.asarray(cluster_local),
        cluster_scale=jnp.asarray(cluster_scale),
        num_hosts=num_hosts, chips_per_host=chips_per_host)


def _hier_tables(h: jnp.ndarray, plan_b: HierPlan):
    """Issue both collectives for one shard: returns the (D·K, F) halo table
    and the (P·C, F) summary table the plan's sender indices point into."""
    C = plan_b.cluster_scale.shape[0]
    buf = h[plan_b.send_idx] * plan_b.send_mask[..., None].astype(h.dtype)
    halo = jax.lax.all_to_all(buf, CHIP_AXIS, split_axis=0, concat_axis=0,
                              tiled=True).reshape(-1, h.shape[-1])

    sums = segment_sum(h, plan_b.cluster_local, C + 1,
                       indices_are_sorted=False)[:C]
    local_summary = sums * plan_b.cluster_scale[:, None].astype(h.dtype)
    # nested single-axis gathers (multi-axis tiled all_gather has no VJP);
    # row order: shard p = host·D + chip contributes rows [p·C, (p+1)·C)
    summaries = jax.lax.all_gather(local_summary, CHIP_AXIS, tiled=True)
    summaries = jax.lax.all_gather(summaries, HOST_AXIS, tiled=True)
    return halo, summaries


def hier_aggregate(h: jnp.ndarray, plan_b: HierPlan) -> jnp.ndarray:
    """One shard's hierarchical aggregation of activations ``h`` (n_loc, F).

    ``plan_b``: this shard's slices (leading shard axis already indexed).
    Collectives are issued FIRST and the interior segment-sum runs while they
    are in flight (no data dependency — XLA schedules them concurrently).
    """
    n_loc = h.shape[0]
    halo, summaries = _hier_tables(h, plan_b)

    # --- interior aggregation (overlaps the collectives) ----------------
    if plan_b.int_hybrid is not None:
        # the single-chip MXU operator, shard-local: dense community tiles
        # on the BCSR kernel + selector-matmul stragglers
        from fitgnn_tpu.ops.hybrid_spmm import hybrid_spmm
        hyb = plan_b.int_hybrid
        n_pad = hyb.num_nodes
        hp = (jnp.pad(h, ((0, n_pad - n_loc), (0, 0)))
              if n_pad != n_loc else h)
        out = hybrid_spmm(hyb, hp)[:n_loc]
    else:
        out = segment_sum(
            h[plan_b.int_senders]
            * plan_b.int_weights[:, None].astype(h.dtype),
            plan_b.int_receivers, n_loc)

    # --- fold in boundary + summary contributions -----------------------
    out = out + segment_sum(
        halo[plan_b.halo_senders]
        * plan_b.halo_weights[:, None].astype(h.dtype),
        plan_b.halo_receivers, n_loc)
    out = out + segment_sum(
        summaries[plan_b.sum_senders]
        * plan_b.sum_weights[:, None].astype(h.dtype),
        plan_b.sum_receivers, n_loc)
    return out


def hier_attention_aggregate(h: jnp.ndarray, plan_b: HierPlan,
                             a_src: jnp.ndarray, a_dst: jnp.ndarray,
                             negative_slope: float) -> jnp.ndarray:
    """One shard's hierarchical GAT aggregation: per-receiver softmax over
    the three edge classes together, with remote-host senders represented by
    their cluster-summary rows (scores computed ON the summary rows — the
    summary stands in for the remote node in both message and score, the
    attention analog of the reference's cluster_node features
    ``utils.py:191-232``).  Receiver-partitioned edges make the softmax
    exact for num_hosts == 1 (no summary edges)."""
    hyb = plan_b.int_hybrid
    if hyb is not None and getattr(hyb, "semantics", None) == "att_unit":
        return _hier_tile_attention(h, plan_b, a_src, a_dst, negative_slope)
    n_loc = h.shape[0]
    halo, summaries = _hier_tables(h, plan_b)
    table = jnp.concatenate([h, halo, summaries], axis=0)
    senders = jnp.concatenate([
        plan_b.int_senders,
        plan_b.halo_senders + n_loc,
        plan_b.sum_senders + n_loc + halo.shape[0]])
    receivers = jnp.concatenate([plan_b.int_receivers,
                                 plan_b.halo_receivers,
                                 plan_b.sum_receivers])
    mask = jnp.concatenate([plan_b.int_weights, plan_b.halo_weights,
                            plan_b.sum_weights]) > 0
    y = table[senders]                                        # (E, C)
    ssrc = y.astype(jnp.float32) @ a_src.astype(jnp.float32)  # (E,)
    sdst = (h.astype(jnp.float32) @ a_dst.astype(jnp.float32))[receivers]
    pre = ssrc + sdst
    pre = jnp.where(pre >= 0, pre, negative_slope * pre)
    from fitgnn_tpu.ops.segment import segment_softmax
    # concat of three receiver-sorted lists is not globally sorted
    alpha = segment_softmax(pre, receivers, n_loc, mask=mask,
                            indices_are_sorted=False)
    return segment_sum(y * alpha[:, None].astype(y.dtype), receivers, n_loc,
                       indices_are_sorted=False)


def _hier_tile_attention(h: jnp.ndarray, plan_b: HierPlan,
                         a_src: jnp.ndarray, a_dst: jnp.ndarray,
                         negative_slope: float) -> jnp.ndarray:
    """Hier GAT with the INTERIOR edges on the tile-dense attention operator
    (``ops.tile_gat.tile_gat_attention`` partials — the same MXU path the
    single-chip GAT runs) and only the halo/summary edges on the per-edge
    path.  The softmax is the SAME per-receiver softmax over all three edge
    classes: the tile partials and the per-edge partials share one
    stabilizer ``m`` that bounds every sender table (local, halo, summary),
    so the combined normalization is exact (softmax shift-invariance).
    Semantics identical to the per-edge branch of
    ``hier_attention_aggregate``; parity gated by tests/test_hierarchical.py.
    """
    from fitgnn_tpu.ops.tile_gat import tile_gat_attention

    hyb = plan_b.int_hybrid
    n_loc = h.shape[0]
    n_pad = hyb.num_nodes
    halo, summaries = _hier_tables(h, plan_b)

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    f32 = jnp.float32
    hp = jnp.pad(h, ((0, n_pad - n_loc), (0, 0))) if n_pad != n_loc else h
    s_src = hp.astype(f32) @ a_src.astype(f32)              # (n_pad,)
    s_dst = hp.astype(f32) @ a_dst.astype(f32)
    s_src_halo = halo.astype(f32) @ a_src.astype(f32)       # (D·K,)
    s_src_sum = summaries.astype(f32) @ a_src.astype(f32)   # (P·C,)

    # one bound covering EVERY sender table (padding rows score 0; the
    # global-max stabilizer already clamps at 0, so they cannot raise it
    # beyond what max(0, ·) allows)
    bound = jnp.maximum(jnp.max(s_src),
                        jnp.maximum(jnp.max(s_src_halo), jnp.max(s_src_sum)))
    bound = jax.lax.stop_gradient(bound)

    # per-edge scores for the halo/summary classes
    mask_h = plan_b.halo_weights > 0
    mask_s = plan_b.sum_weights > 0
    sdst_loc = s_dst[:n_loc]
    es_h = leaky(s_src_halo[plan_b.halo_senders]
                 + sdst_loc[plan_b.halo_receivers])
    es_s = leaky(s_src_sum[plan_b.sum_senders]
                 + sdst_loc[plan_b.sum_receivers])
    neg = jnp.float32(-1e30)
    # mask BEFORE the exp (tile_gat convention: an over-m padding score
    # would exp to inf and 0·inf = NaN under the exact-max stabilizer)
    es_h = jnp.where(mask_h, es_h, neg)
    es_s = jnp.where(mask_s, es_s, neg)
    # raw segment_max (identity -inf) — ops.segment.segment_max converts
    # empty segments to 0.0, which would silently force m ≥ 0 on receivers
    # with no external edges and defeat the exact-max branch
    ext_m = jnp.maximum(
        jax.ops.segment_max(es_h, plan_b.halo_receivers,
                            num_segments=n_loc),
        jax.ops.segment_max(es_s, plan_b.sum_receivers,
                            num_segments=n_loc))
    ext_m = jnp.maximum(ext_m, neg)                # -inf → finite floor
    ext_m = (jnp.pad(ext_m, (0, n_pad - n_loc), constant_values=-1e30)
             if n_pad != n_loc else ext_m)

    num, den, m = tile_gat_attention(hyb, s_src, s_dst, hp, negative_slope,
                                     att_src=a_src, partials=True,
                                     src_score_bound=bound,
                                     extra_rowmax=ext_m)
    num, den, m = num[:n_loc], den[:n_loc], m[:n_loc]

    pes_h = (jnp.exp(es_h - m[plan_b.halo_receivers])
             * mask_h.astype(f32))
    pes_s = (jnp.exp(es_s - m[plan_b.sum_receivers])
             * mask_s.astype(f32))
    num = num + segment_sum(
        halo[plan_b.halo_senders] * pes_h[:, None].astype(h.dtype),
        plan_b.halo_receivers, n_loc, indices_are_sorted=False)
    num = num + segment_sum(
        summaries[plan_b.sum_senders] * pes_s[:, None].astype(h.dtype),
        plan_b.sum_receivers, n_loc, indices_are_sorted=False)
    den = den + segment_sum(pes_h, plan_b.halo_receivers, n_loc,
                            indices_are_sorted=False)
    den = den + segment_sum(pes_s, plan_b.sum_receivers, n_loc,
                            indices_are_sorted=False)
    den = jnp.maximum(den, 1e-16).astype(h.dtype)
    return num / den[:, None]


class HierGCNConv(nn.Module):
    """GCN layer over a ``HierPlan`` — param tree matches ``DistGCNConv``."""

    features: int

    @nn.compact
    def __call__(self, x_local, plan_b: HierPlan):
        h = nn.Dense(self.features, use_bias=False, name="lin")(x_local)
        out = hier_aggregate(h, plan_b)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), x_local.dtype)
        return out + bias


class HierSAGEConv(nn.Module):
    """SAGE layer over a ``HierPlan`` (plan weights = neighbor-mean weights,
    ``shard.LAYER_SEMANTICS['SAGEConv']``); param tree matches
    ``models.layers.SAGEConv``."""

    features: int

    @nn.compact
    def __call__(self, x_local, plan_b: HierPlan):
        lin_l = nn.Dense(self.features, use_bias=True, name="lin_l")
        b_l = lin_l(jnp.zeros((1, x_local.shape[-1]), x_local.dtype))
        h = lin_l(x_local) - b_l
        out = hier_aggregate(h, plan_b) + b_l
        return out + nn.Dense(self.features, use_bias=False,
                              name="lin_r")(x_local)


class HierGINConv(nn.Module):
    """GIN layer over a ``HierPlan`` (plan weights = unit non-self weights);
    param tree matches ``models.layers.GINConv``."""

    features: int

    @nn.compact
    def __call__(self, x_local, plan_b: HierPlan):
        eps = self.param("eps", nn.initializers.zeros, ())
        mlp_0 = nn.Dense(self.features, name="mlp_0")
        b0 = mlp_0(jnp.zeros((1, x_local.shape[-1]), x_local.dtype))
        h0 = mlp_0(x_local) - b0
        s = hier_aggregate(h0, plan_b)
        h = nn.relu((1.0 + eps).astype(h0.dtype) * h0 + s + b0)
        return nn.relu(nn.Dense(self.features, name="mlp_1")(h))


class HierGATConv(nn.Module):
    """Single-head GAT layer over a ``HierPlan`` (plan weights = unit mask,
    ``att_unit``); param tree matches ``models.layers.GATConv`` at heads=1."""

    features: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x_local, plan_b: HierPlan):
        from fitgnn_tpu.models.layers import _Kernel
        kernel = _Kernel((x_local.shape[-1], self.features), name="lin")()
        a_src = self.param("att_src", nn.initializers.glorot_uniform(),
                           (1, self.features))
        a_dst = self.param("att_dst", nn.initializers.glorot_uniform(),
                           (1, self.features))
        h = x_local @ kernel
        out = hier_attention_aggregate(h, plan_b, a_src[0], a_dst[0],
                                       self.negative_slope)
        return out + self.param("bias", nn.initializers.zeros,
                                (self.features,),
                                jnp.float32).astype(out.dtype)


HIER_LAYER_REGISTRY = {
    "GCNConv": HierGCNConv,
    "SAGEConv": HierSAGEConv,
    "GINConv": HierGINConv,
    "GATConv": HierGATConv,
}


class HierNodeModel(nn.Module):
    """Node model over the hierarchical plan; param tree mirrors
    ``DistNodeModel`` ({"convs": {"<layer>_i": ...}, "head"}); the layer is
    selected by name like the reference (``network.py:13``)."""

    hidden: int
    num_layers: int
    out_dim: int
    classify: bool = True
    dropout_rate: float = 0.5
    layer_name: str = "GCNConv"

    @nn.compact
    def __call__(self, x_local, plan_b: HierPlan, *, train: bool = False):
        if self.layer_name not in HIER_LAYER_REGISTRY:
            raise ValueError(
                f"unknown hier layer {self.layer_name!r}; choose from "
                f"{sorted(HIER_LAYER_REGISTRY)}")
        layer_cls = HIER_LAYER_REGISTRY[self.layer_name]
        layer_name = self.layer_name

        class _Stack(nn.Module):
            hidden: int
            num_layers: int
            dropout_rate: float

            @nn.compact
            def __call__(self, x, *, train=False):
                for i in range(self.num_layers):
                    x = layer_cls(self.hidden, name=f"{layer_name}_{i}")(
                        x, plan_b)
                    x = nn.elu(x)
                    x = nn.Dropout(self.dropout_rate,
                                   deterministic=not train)(x)
                return x

        x = _Stack(self.hidden, self.num_layers, self.dropout_rate,
                   name="convs")(x_local, train=train)
        x = nn.Dense(self.out_dim, name="head")(x)
        if self.classify:
            return nn.log_softmax(x, axis=-1)
        return x


def make_hier_mesh(num_hosts: int, chips_per_host: int,
                   devices=None) -> "jax.sharding.Mesh":
    from jax.sharding import Mesh
    devices = devices if devices is not None else jax.devices()
    P = num_hosts * chips_per_host
    if len(devices) < P:
        raise ValueError(f"need {P} devices, have {len(devices)}")
    arr = np.array(devices[:P]).reshape(num_hosts, chips_per_host)
    return Mesh(arr, (HOST_AXIS, CHIP_AXIS))


def make_hier_train_step(mesh, model: HierNodeModel, plan: HierPlan):
    """(state, x, y, mask, plan, rng) → (state, loss): same psum'd-GD
    semantics as ``make_dist_train_step`` over the 2-D mesh.  The task
    follows ``model.classify`` (NLL vs masked L1 — the reference trains
    node_reg through the same runners, ``run.py:508``)."""
    import functools
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from fitgnn_tpu.train.losses import task_loss_sums

    task = "classification" if model.classify else "regression"
    SH = P((HOST_AXIS, CHIP_AXIS))
    plan_spec = jax.tree_util.tree_map(lambda _: SH, plan)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), SH, SH, SH, plan_spec, P()),
        out_specs=(P(), P()),
        check_vma=False)
    def step(state, xb, yb, mb, plan_b: HierPlan, rng):
        x = xb[0]
        y, m = yb[0], mb[0]
        pb = jax.tree_util.tree_map(lambda a: a[0], plan_b)

        def loss_fn(params):
            out = model.apply(params, x, pb, train=True,
                              rngs={"dropout": rng})
            local_sum, local_cnt = task_loss_sums(task, out, y, m)
            cnt = jax.lax.psum(local_cnt, (HOST_AXIS, CHIP_AXIS))
            return local_sum / jnp.maximum(cnt, 1.0)

        local_loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.psum(grads, (HOST_AXIS, CHIP_AXIS))
        loss = jax.lax.psum(local_loss, (HOST_AXIS, CHIP_AXIS))
        return state.apply_gradients(grads=grads), loss

    return jax.jit(step)


def make_hier_eval_step(mesh, model: HierNodeModel, plan: HierPlan):
    """(state, x, y, mask, plan) → (loss, metric) over the 2-D mesh.
    Classification metric = accuracy; regression metric = the reference's
    std-normalized L1 with GLOBAL target moments (``run.py:110,168``)."""
    import functools
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from fitgnn_tpu.train.losses import (task_loss_sums,
                                         task_metric_from_sums,
                                         task_metric_sums)

    task = "classification" if model.classify else "regression"
    SH = P((HOST_AXIS, CHIP_AXIS))
    plan_spec = jax.tree_util.tree_map(lambda _: SH, plan)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), SH, SH, SH, plan_spec),
        out_specs=(P(), P()),
        check_vma=False)
    def step(state, xb, yb, mb, plan_b: HierPlan):
        x = xb[0]
        y, m = yb[0], mb[0]
        pb = jax.tree_util.tree_map(lambda a: a[0], plan_b)
        out = model.apply(state.params, x, pb)
        ls, c = task_loss_sums(task, out, y, m)
        ms, ys, y2s = task_metric_sums(task, out, y, m)
        ls, c, ms, ys, y2s = jax.lax.psum((ls, c, ms, ys, y2s),
                                          (HOST_AXIS, CHIP_AXIS))
        metric = task_metric_from_sums(task, ls, c, ms, ys, y2s)
        return ls / jnp.maximum(c, 1.0), metric

    return jax.jit(step)


def init_hier_params(model: HierNodeModel, plan: HierPlan, x_sharded,
                     rng) -> dict:
    """Init params on one shard's shapes under a dummy 2-axis vmap (the
    model's collectives need both axis names bound; size-1 axes make the
    gathers no-ops)."""
    pb0 = jax.tree_util.tree_map(lambda a: a[:1][None], plan)

    def init_fn(xb, pb):
        return model.init(rng, xb, pb)

    params = jax.vmap(jax.vmap(init_fn, axis_name=CHIP_AXIS),
                      axis_name=HOST_AXIS)(x_sharded[:1][None], pb0)
    return jax.tree_util.tree_map(lambda a: a[0, 0], params)


def hier_oracle_features(x: np.ndarray, senders: np.ndarray,
                         receivers: np.ndarray, weights: np.ndarray,
                         num_hosts: int, chips_per_host: int,
                         nodes_per_shard: int, cluster_of: np.ndarray,
                         summary: str = "mean") -> np.ndarray:
    """Single-device oracle of the hierarchical aggregation semantics:
    ``out[r] = Σ w_e · f(s)`` where ``f(s) = x[s]`` for same-host senders and
    the sender's cluster summary for remote-host senders.  For parity tests.
    """
    D = chips_per_host
    n = x.shape[0]
    cluster_of = np.asarray(cluster_of)
    n_clusters = int(cluster_of.max()) + 1
    sums = np.zeros((n_clusters, x.shape[1]), dtype=np.float64)
    np.add.at(sums, cluster_of, x.astype(np.float64))
    counts = np.bincount(cluster_of, minlength=n_clusters).astype(np.float64)
    scale = (1.0 / np.maximum(counts, 1) if summary == "mean"
             else 1.0 / np.sqrt(np.maximum(counts, 1)))
    summaries = sums * scale[:, None]

    out = np.zeros_like(x, dtype=np.float64)
    host_of = (np.arange(n) // nodes_per_shard) // D
    for s, r, w in zip(senders, receivers, weights):
        feat = (x[s].astype(np.float64) if host_of[s] == host_of[r]
                else summaries[cluster_of[s]])
        out[r] += w * feat
    return out.astype(x.dtype)
