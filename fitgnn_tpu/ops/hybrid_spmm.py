"""Hybrid BCSR + COO SpMM.

Community-reordered graphs put most edges inside dense 128×128 adjacency
tiles (MXU food, streamed at HBM bandwidth), but a power-law tail of cut
edges would fill millions of nearly-empty tiles.  The hybrid splits edges by
tile occupancy:

* tiles with ≥ ``min_block_edges`` edges → dense BCSR tiles (Pallas MXU
  kernel, ``ops/pallas/bsr_spmm.py``);
* the remainder → COO gather + sorted segment-sum.

Both halves are differentiable (BCSR via its transpose-structure VJP); the
adjacency is constant in every FIT-GNN mode so only dX flows.

Traffic model: a dense tile costs ~(64 + 2·F/256) KB; a COO edge costs
~F·4 B gathered + amortized output.  With F=512 the break-even is ≈150
edges/tile — the default threshold.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.struct

from fitgnn_tpu.ops.pallas.bsr_spmm import BsrMatrix, build_bsr, bsr_spmm, BLOCK
from fitgnn_tpu.ops.spmm import spmm_coo


@flax.struct.dataclass
class HybridSpmm:
    bsr: Optional[BsrMatrix]           # None when no tile is dense enough
    senders: jnp.ndarray               # straggler COO, receiver-sorted
    receivers: jnp.ndarray
    weights: jnp.ndarray
    t_senders: jnp.ndarray             # transpose COO (for the VJP),
    t_receivers: jnp.ndarray           # receiver-sorted in transpose space
    t_weights: jnp.ndarray
    num_nodes: int = flax.struct.field(pytree_node=False)
    segmm: Optional[object] = None     # ops.pallas.coo_segmm.SegMM — MXU
    t_segmm: Optional[object] = None   # scatter path for the stragglers
    semantics: str = flax.struct.field(pytree_node=False, default="gcn_norm")
                                       # which aggregation this operator's
                                       # weights encode: "gcn_norm" (sym-
                                       # normalized A+I), "mean_nonself"
                                       # (SAGE neighbor mean), "sum_nonself"
                                       # (GIN sum) — layers consume the aux
                                       # operator only when it matches
    t_edge_perm: Optional[jnp.ndarray] = None  # (E,) forward-list position
                                       # of each transpose-list entry — maps
                                       # per-edge data (GAT α, cotangents)
                                       # between the two sorted orders so
                                       # every backward scatter stays sorted
    dyn_plan: Optional[object] = None  # ops.pallas.bsr_dynamic.DynPlan —
                                       # transpose-order plan for DYNAMIC
                                       # tile values (GAT attention tiles);
                                       # built only for att_unit semantics
    diag_blocks: Optional[jnp.ndarray] = None  # (NB, B, B) block-DIAGONAL
                                       # dense tiles (opt-in split)
    diag_r: int = flax.struct.field(pytree_node=False, default=0)
                                       # >0: run the diagonal through the
                                       # Pallas diag-run kernel (R blocks
                                       # per grid step, contiguous X/out
                                       # slabs — ops/pallas/diag_spmm.py)
                                       # with the straggler+diag+tile adds
                                       # fused through init operands;
                                       # 0: XLA batched einsum (the round-2
                                       # variant, kept for A/B)
    # --- cluster-factorized straggler collapse (opt-in) -------------------
    # Straggler edges collapse onto their sender's CLUSTER-SUMMARY row: the
    # per-edge straggler path disappears and the remote context rides a
    # dense (N, C) MXU block over per-cluster mean summaries — the
    # single-chip analog of the hierarchical path's summary exchange
    # (parallel/hierarchical.py) and of the reference's cluster_node
    # approximation (utils.py:191-232).  Two flavors share these fields:
    #   att_unit semantics (``cluster_att``): the table holds straggler
    #     EDGE COUNTS — duplicate edges from one cluster share the
    #     summary's attention score with multiplicity;
    #   static semantics (``cluster_agg``, GCN/SAGE/GIN): the table holds
    #     the SUMMED EDGE WEIGHTS — each straggler edge (u→v, w)
    #     contributes w·mean(x over u's cluster) instead of w·x[u], so the
    #     whole straggler aggregation is (N, C) @ (C, F) on the MXU.
    cluster_count: Optional[jnp.ndarray] = None  # (N, C) straggler edge
                                       # counts (att) or summed weights
                                       # (static) per (receiver, sender
                                       # cluster); bf16 (exact ≤256 counts)
                                       # or f32
    cluster_scale: Optional[jnp.ndarray] = None  # (C,) 1/|real members|
    cluster_member: Optional[jnp.ndarray] = None  # (N,) 1.0 on real rows
    cluster_size: int = flax.struct.field(pytree_node=False, default=0)
                                       # nodes per cluster (contiguous
                                       # equal-size blocks in the ordered
                                       # id space; 0 = mode off)

    @property
    def num_coo_edges(self) -> int:
        return self.senders.shape[0]


def build_hybrid(senders: np.ndarray, receivers: np.ndarray,
                 weight: np.ndarray, num_nodes_padded: int,
                 min_block_edges: int = 150,
                 block: int = BLOCK, tile_dtype=None,
                 use_segmm: bool = False,
                 segmm_group: int = None,
                 use_diag: bool = False,
                 diag_r: int | None = None,
                 use_rowwalk: bool = False,
                 tile_group: int = 1,
                 use_einsum_tiles: bool = False,
                 semantics: str = "gcn_norm",
                 cluster_att: int = 0,
                 cluster_att_exact: int = 0,
                 cluster_agg: int = 0,
                 cluster_agg_exact: int = 0,
                 real_nodes: int | None = None,
                 build_dyn: bool = True) -> HybridSpmm:
    """Split edges by tile occupancy and build both structures (host-side).

    ``cluster_att`` (att_unit only): nodes per cluster — straggler edges
    collapse onto dense (N, C) counts against their sender's cluster and
    the per-edge straggler lists empty out (see HybridSpmm.cluster_count).
    ``cluster_att_exact``: HYBRID split — the top-k straggler SENDERS by
    straggler out-degree (the edge mass their per-edge scores carry) keep
    the exact per-edge path; only the tail collapses onto summaries.  The
    reference offers extra_node (exact halo) and cluster_node (summary)
    as a per-run dichotomy (``utils.py:235-239`` vs ``:191-232``); this
    offers both per edge, trading accuracy back for step time where the
    remote signal concentrates in few senders.
    ``cluster_agg`` (static semantics — GCN/SAGE/GIN): the same collapse
    for static-weight aggregations: each straggler edge (u→v, w)
    contributes w·mean(x over u's cluster) instead of w·x[u]; the (N, C)
    table holds summed weights and the whole straggler path becomes one
    MXU matmul (APPROXIMATE — the reference's cluster_node idea applied
    per edge).  ``cluster_agg_exact``: top-k straggler senders by
    straggler WEIGHT MASS keep the exact per-edge path.
    ``real_nodes``: count of non-padding node rows (summary means exclude
    padding); defaults to ``num_nodes_padded``."""
    assert num_nodes_padded % block == 0
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float32)
    nb = num_nodes_padded // block
    tile = (receivers // block) * nb + (senders // block)
    uniq, inv, counts = np.unique(tile, return_inverse=True,
                                  return_counts=True)
    dense_all = counts[inv] >= min_block_edges

    diag_blocks = None
    diag_r_val = 0
    on_diag = np.zeros_like(dense_all)
    if use_diag:
        on_diag = dense_all & (receivers // block == senders // block)
        if on_diag.any():
            db = np.zeros((nb, block, block), dtype=np.float32)
            np.add.at(db, (receivers[on_diag] // block,
                           receivers[on_diag] % block,
                           senders[on_diag] % block), weight[on_diag])
            diag_blocks = jnp.asarray(db)
            if tile_dtype is not None:
                diag_blocks = diag_blocks.astype(tile_dtype)
            if diag_r is None:
                from fitgnn_tpu.ops.pallas.diag_spmm import pick_run_length
                diag_r_val = pick_run_length(nb)
            else:
                diag_r_val = diag_r
        else:
            on_diag = np.zeros_like(dense_all)

    bsr = None
    bsr_mask = dense_all & ~on_diag
    if bsr_mask.any():
        bsr = build_bsr(senders[bsr_mask].astype(np.int64),
                        receivers[bsr_mask].astype(np.int64),
                        weight[bsr_mask], num_nodes_padded, block=block,
                        tile_dtype=tile_dtype, rowwalk=use_rowwalk,
                        group=tile_group, einsum=use_einsum_tiles)

    cs, cr, cw = (senders[~dense_all], receivers[~dense_all],
                  weight[~dense_all])

    cluster_count = cluster_scale = cluster_member = None
    cluster_size = 0
    if cluster_att and cluster_agg:
        raise ValueError("cluster_att and cluster_agg are mutually "
                         "exclusive (attention vs static semantics)")
    if cluster_att or cluster_agg:
        if cluster_att and semantics != "att_unit":
            raise ValueError("cluster_att is an attention factorization "
                             "(semantics='att_unit' only)")
        if cluster_agg and semantics == "att_unit":
            raise ValueError("cluster_agg is for static-weight semantics; "
                             "use cluster_att for att_unit")
        K = cluster_att or cluster_agg
        exact_k = cluster_att_exact if cluster_att else cluster_agg_exact
        if num_nodes_padded % K:
            raise ValueError(f"cluster size {K} must divide the "
                             f"padded node count {num_nodes_padded}")
        C = num_nodes_padded // K
        real = (cw > 0)                    # padding edges never count
        keep_exact = np.zeros(len(cs), dtype=bool)
        if exact_k:
            # rank senders by the straggler mass their edges carry: edge
            # count under attention (scores are dynamic), summed static
            # weight otherwise
            if cluster_att:
                deg = np.bincount(cs[real], minlength=num_nodes_padded
                                  ).astype(np.float64)
            else:
                deg = np.bincount(cs[real], weights=cw[real].astype(
                    np.float64), minlength=num_nodes_padded)
            k = min(int(exact_k), int((deg > 0).sum()))
            if k:
                top = np.argpartition(deg, -k)[-k:]
                is_top = np.zeros(num_nodes_padded, dtype=bool)
                is_top[top[deg[top] > 0]] = True
                keep_exact = is_top[cs] & real
        collapse = real & ~keep_exact
        cc = np.zeros((num_nodes_padded, C), dtype=np.float32)
        np.add.at(cc, (cr[collapse], cs[collapse] // K),
                  1.0 if cluster_att else cw[collapse])
        # bf16 keeps the (N, C) table half-size and is exact for integer
        # counts ≤ 256 (ties to the remote-compile payload limit: pass the
        # table as a runtime input, never a baked constant); static-weight
        # tables hold fractional sums and stay f32
        if cluster_att:
            cdtype = jnp.bfloat16 if cc.max() <= 256 else jnp.float32
        else:
            # static-weight tables hold the SAME fractional weight sums the
            # BCSR tiles store, so they follow the same storage policy:
            # f32 by default, bf16 only when tile_dtype opts the tiles in
            cdtype = tile_dtype if tile_dtype is not None else jnp.float32
        nr = num_nodes_padded if real_nodes is None else int(real_nodes)
        member = (np.arange(num_nodes_padded) < nr).astype(np.float32)
        counts = member.reshape(C, K).sum(axis=1)
        cluster_count = jnp.asarray(cc, dtype=cdtype)
        cluster_scale = jnp.asarray(1.0 / np.maximum(counts, 1.0),
                                    dtype=jnp.float32)
        cluster_member = jnp.asarray(member)
        cluster_size = K
        cs, cr, cw = cs[keep_exact], cr[keep_exact], cw[keep_exact]

    if len(cs) == 0:  # keep shapes non-empty for jit friendliness
        cs = np.array([num_nodes_padded - 1], dtype=np.int64)
        cr = np.array([num_nodes_padded - 1], dtype=np.int64)
        cw = np.array([0.0], dtype=np.float32)

    order_f = np.argsort(cr, kind="stable")
    s_f, r_f, w_f = (jnp.asarray(cs[order_f], dtype=jnp.int32),
                     jnp.asarray(cr[order_f], dtype=jnp.int32),
                     jnp.asarray(cw[order_f]))
    # transpose: roles swap; sort by the transpose's receiver (= sender)
    order_t = np.argsort(cs, kind="stable")
    s_t, r_t, w_t = (jnp.asarray(cr[order_t], dtype=jnp.int32),
                     jnp.asarray(cs[order_t], dtype=jnp.int32),
                     jnp.asarray(cw[order_t]))
    # forward-list position of each transpose-list entry: keeps per-edge
    # data (GAT α, cotangents) movable between the two sorted orders so
    # every backward scatter can stay sorted
    inv_f = np.empty(len(order_f), dtype=np.int64)
    inv_f[order_f] = np.arange(len(order_f))
    t_edge_perm = inv_f[order_t]
    segmm = t_segmm = None
    if use_segmm:
        from fitgnn_tpu.ops.pallas.coo_segmm import build_segmm
        segmm = build_segmm(cs[order_f], cr[order_f], cw[order_f],
                            num_nodes_padded, group=segmm_group)
        # the transpose structure's edge_ids point back into FORWARD edge
        # order, so dynamic per-edge weights (GAT α) need no re-sort
        t_segmm = build_segmm(cr[order_t], cs[order_t], cw[order_t],
                              num_nodes_padded, group=segmm_group,
                              edge_perm=t_edge_perm)
    dyn_plan = None
    if (build_dyn and semantics == "att_unit" and bsr is not None
            and not bsr.rowwalk and not bsr.einsum):
        # the plan needs the grid-walk tile order: rows sorted ascending
        # with coverage fillers (zero-mask tiles → zero pe, inert)
        from fitgnn_tpu.ops.pallas.bsr_dynamic import build_dyn_plan
        dyn_plan = build_dyn_plan(np.asarray(bsr.rows), np.asarray(bsr.cols),
                                  bsr.num_row_blocks)
    return HybridSpmm(bsr=bsr, senders=s_f, receivers=r_f, weights=w_f,
                      t_senders=s_t, t_receivers=r_t, t_weights=w_t,
                      t_edge_perm=jnp.asarray(t_edge_perm, dtype=jnp.int32),
                      num_nodes=num_nodes_padded, semantics=semantics,
                      segmm=segmm, t_segmm=t_segmm, dyn_plan=dyn_plan,
                      diag_blocks=diag_blocks, diag_r=diag_r_val,
                      cluster_count=cluster_count,
                      cluster_scale=cluster_scale,
                      cluster_member=cluster_member,
                      cluster_size=cluster_size)


def _coo_apply(h: HybridSpmm, x: jnp.ndarray) -> jnp.ndarray:
    """Forward straggler aggregation (no VJP wrapper)."""
    if h.segmm is not None:
        from fitgnn_tpu.ops.pallas.coo_segmm import segmm_spmm
        return segmm_spmm(h.segmm, x)
    return spmm_coo(h.weights, h.senders, h.receivers, x, h.num_nodes)


def _coo_apply_t(h: HybridSpmm, g: jnp.ndarray) -> jnp.ndarray:
    """Transpose straggler aggregation through the pre-sorted transpose
    edge list: both the gather and the scatter stay sorted (autodiff would
    emit an unsorted scatter)."""
    if h.t_segmm is not None:
        from fitgnn_tpu.ops.pallas.coo_segmm import segmm_spmm
        return segmm_spmm(h.t_segmm, g)
    return spmm_coo(h.t_weights, h.t_senders, h.t_receivers, g, h.num_nodes)


@jax.custom_vjp
def _coo_part(h: HybridSpmm, x: jnp.ndarray) -> jnp.ndarray:
    return _coo_apply(h, x)


def _coo_part_fwd(h, x):
    return _coo_part(h, x), h


def _coo_part_bwd(h, g):
    return None, _coo_apply_t(h, g)


_coo_part.defvjp(_coo_part_fwd, _coo_part_bwd)


@jax.custom_vjp
def _fused_core(h: HybridSpmm, x: jnp.ndarray) -> jnp.ndarray:
    """stragglers + tiles with the add fused INTO the BSR kernel (the tile
    kernel accumulates on top of the straggler output — saves two full
    (N, F) HBM passes per direction vs materializing both and adding)."""
    from fitgnn_tpu.ops.pallas.bsr_spmm import bsr_spmm_acc_raw
    return bsr_spmm_acc_raw(h.bsr, x, _coo_apply(h, x))


def _fused_core_fwd(h, x):
    return _fused_core(h, x), h


def _fused_core_bwd(h, g):
    from fitgnn_tpu.ops.pallas.bsr_spmm import bsr_spmm_acc_raw
    t = h.bsr.transpose.replace(rowwalk=h.bsr.rowwalk, einsum=h.bsr.einsum)
    return None, bsr_spmm_acc_raw(t, g, _coo_apply_t(h, g))


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def _diag_chain(h: HybridSpmm, x: jnp.ndarray, transpose: bool) -> jnp.ndarray:
    """stragglers → diag-run kernel → BSR tiles, every add fused through an
    init operand (zero separate (N, F) add passes)."""
    from fitgnn_tpu.ops.pallas.bsr_spmm import bsr_spmm_acc_raw
    from fitgnn_tpu.ops.pallas.diag_spmm import diag_spmm_raw
    out = _coo_apply_t(h, x) if transpose else _coo_apply(h, x)
    out = diag_spmm_raw(h.diag_blocks, x, h.diag_r, transpose=transpose,
                        init=out)
    if h.bsr is not None:
        b = (h.bsr.transpose.replace(rowwalk=h.bsr.rowwalk,
                                     einsum=h.bsr.einsum)
             if transpose else h.bsr)
        out = bsr_spmm_acc_raw(b, x, out)
    return out


@jax.custom_vjp
def _fused_core_diag(h: HybridSpmm, x: jnp.ndarray) -> jnp.ndarray:
    return _diag_chain(h, x, transpose=False)


def _fused_core_diag_fwd(h, x):
    return _fused_core_diag(h, x), h


def _fused_core_diag_bwd(h, g):
    # symmetric structure: dX = Aᵀ·g rides the same chain with the COO
    # transpose lists, the in-VMEM-transposed diag blocks, and the BSR
    # transpose structure
    return None, _diag_chain(h, g, transpose=True)


_fused_core_diag.defvjp(_fused_core_diag_fwd, _fused_core_diag_bwd)


def _cluster_static_term(h: HybridSpmm, x: jnp.ndarray) -> jnp.ndarray:
    """Collapsed-straggler aggregation for static semantics: summaries are
    member-means over contiguous K-node groups (reshape-mean — no scatter),
    then one (N, C) @ (C, F) MXU matmul applies the summed edge weights.
    Autodiff is clean: the backward is a broadcast + the transposed matmul
    (no scatter on either side).

    Precision discipline: the K-member reduction must NOT accumulate at
    bf16 (a 2048-element bf16 chain sum loses ~3 decimal digits), but an
    explicit f32 reduction materializes f32 (N, F) streams and measured
    +1.3-1.4 ms/step — so the sum rides a ones-vector dot_general with
    ``preferred_element_type=f32``: the MXU reads bf16 rows and
    accumulates in its internal f32 accumulator, giving f32-accurate
    sums at bf16 byte traffic.  The weight table's storage dtype is fixed
    at BUILD time by the same ``tile_dtype`` knob that governs the BCSR
    tiles (f32 default, bf16 opt-in) — never by the activation dtype — and
    the final matmul accumulates f32 via ``preferred_element_type``."""
    K = h.cluster_size
    F = x.shape[-1]
    C = h.cluster_count.shape[1]
    member = h.cluster_member.astype(x.dtype)   # 0/1 — exact at any dtype
    xb = (x * member[:, None]).reshape(C, K, F)
    ones = jnp.ones((K,), x.dtype)
    sums = jax.lax.dot_general(xb, ones, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    table = h.cluster_count
    summaries = (sums * h.cluster_scale[:, None]).astype(table.dtype)
    out = jax.lax.dot_general(table, summaries, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def hybrid_spmm(h: HybridSpmm, x: jnp.ndarray) -> jnp.ndarray:
    out = _hybrid_spmm_main(h, x)
    if h.cluster_size and h.semantics != "att_unit":
        out = out + _cluster_static_term(h, x).astype(out.dtype)
    return out


def _hybrid_spmm_main(h: HybridSpmm, x: jnp.ndarray) -> jnp.ndarray:
    if (h.diag_blocks is not None and h.diag_r > 0
            and (h.bsr is None or h.bsr.transpose is not None)
            and not (h.bsr is not None and (h.bsr.rowwalk or h.bsr.einsum
                                            or h.bsr.group > 1))):
        return _fused_core_diag(h, x)
    if h.bsr is not None and h.bsr.transpose is not None:
        out = _fused_core(h, x)
    else:
        out = _coo_part(h, x)
        if h.bsr is not None:
            out = out + bsr_spmm(h.bsr, x)
    if h.diag_blocks is not None:
        nb, b, _ = h.diag_blocks.shape
        xb = x.reshape(nb, b, x.shape[-1])
        if h.diag_blocks.dtype == jnp.bfloat16:
            xb = xb.astype(jnp.bfloat16)
        # no preferred_element_type: the MXU accumulates f32 internally and
        # rounds at output — requesting an f32 result would materialize a
        # full-size f32 intermediate before the cast back
        dg = jnp.einsum("bij,bjf->bif", h.diag_blocks, xb)
        out = out + dg.reshape(x.shape).astype(out.dtype)
    return out
