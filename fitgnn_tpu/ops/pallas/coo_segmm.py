"""Selector-matmul segment-sum: the straggler COO scatter on the MXU.

The hybrid operator's straggler edges are irreducibly scattered (~1 edge per
128×128 tile after community reordering), so their aggregation is a random
row-gather plus a sorted segment-sum.  XLA's scatter loop read-modify-writes
the output row per edge; this kernel replaces that with dense MXU work:

* edges (receiver-sorted) are chunked, each chunk padded to ``CHUNK`` edges
  and assigned to ONE output block-group of ``GROUP`` 128-row blocks;
* the gather ``y = x[senders]`` stays an XLA op (it is row-rate-bound either
  way) and streams into the kernel as (CHUNK, F) blocks;
* in-kernel, a (128·GROUP, CHUNK) selector holding ``w[e]`` at
  ``(r_local[e], e)`` is built from an iota compare and multiplied on the
  MXU; consecutive chunks of one block-group accumulate in a VMEM-resident
  out tile (same revisit pattern as the BCSR kernel, with the chunk→group
  map scalar-prefetched).

This is the "fuse stragglers via scalar-prefetched edge lists" path
(reference hot loop #1's tail, SURVEY §3 / ROADMAP).
"""

from __future__ import annotations

import functools
import os
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import flax.struct

BLOCK = 128
# edges per selector chunk: each receiver-block-group's edge list pads to a
# multiple of this.  128 ⇒ ~31 % padding on the bench straggler list at
# group=1 (E_pad 335k vs E 233k); 64 halves the padding at 2× the grid
# steps (measured SLOWER end-to-end).
CHUNK = int(os.environ.get("FITGNN_SEGMM_CHUNK", "128"))
# output 128-row blocks spanned by one selector: the selector becomes
# (128·group, CHUNK) and each GROUP of blocks pads its edge list once, so
# the expected padding drops from ~CHUNK/2 per block to ~CHUNK/2 per group
# (31 % → ~5 % at group=8 on the bench list).  The extra MXU flops are
# negligible (the kernel is stream/step-bound, not MXU-bound).
# "auto" (default) picks the largest group that tiles the node blocks
# exactly; a non-divisor group pays a full (N, F) slice pass for the
# rounded-up out buffer (bench A/B: g4 exact 19.4 ms < g8 slice 20.0 <
# g1 21.0 — prefer exact fit, but slicing still beats no grouping).
GROUP = os.environ.get("FITGNN_SEGMM_GROUP", "auto")


def _auto_group(num_blocks: int) -> int:
    for g in (8, 4, 2):
        if num_blocks % g == 0:
            return g
    return min(4, max(num_blocks, 1))   # slice fallback


def _resolve_group(group, num_blocks: int) -> int:
    if group is None:
        group = GROUP
    if group == "auto":
        return _auto_group(num_blocks)
    return int(group)


@flax.struct.dataclass
class SegMM:
    """Chunked straggler-edge structure (receiver-sorted, block-aligned)."""

    block_ids: jnp.ndarray     # (num_chunks,) int32 out block-GROUP per
                               #   chunk, sorted ascending (scalar-prefetched)
    senders: jnp.ndarray       # (E_pad,) int32 — drives the XLA gather
    aux: jnp.ndarray           # (num_chunks, 8, CHUNK) f32 — row 0 holds
                               #   receiver % BLOCK, row 1 the edge weight
                               #   (packed into one (8,128)-tileable block;
                               #   rows 2..7 are padding)
    num_nodes: int = flax.struct.field(pytree_node=False)
    first_slot: jnp.ndarray = None  # (E,) int32 slot index of each
                               #   forward edge's first occurrence in the
                               #   padded slot stream (host-computed at
                               #   build; drives the saved-y backward of
                               #   ``segmm_weighted_spmm_den``)
    edge_ids: jnp.ndarray = None  # (E_pad,) int32 original edge index per
                               #   slot (padding slots repeat a real index
                               #   but carry weight 0) — lets callers remap
                               #   per-edge data (e.g. GAT α) into slot
                               #   order for ``segmm_scatter_rows``
    group: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def num_chunks(self) -> int:
        return self.block_ids.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[0]


def build_segmm(senders: np.ndarray, receivers: np.ndarray,
                weight: np.ndarray, num_nodes_padded: int,
                chunk: int = CHUNK, group: int = None,
                edge_perm: np.ndarray | None = None) -> SegMM:
    """Host-side build from a RECEIVER-SORTED COO edge list.

    ``edge_perm`` (optional): for list position ``i``, the index of that
    edge in the caller's canonical order — stored into ``edge_ids`` so a
    per-edge weight vector in canonical order can be remapped to slot
    order (``segmm_weighted_spmm``).  Defaults to the identity (the list
    IS the canonical order); a transpose structure passes the mapping
    back to the forward list."""
    assert num_nodes_padded % BLOCK == 0
    group = _resolve_group(group, num_nodes_padded // BLOCK)
    rows_per = BLOCK * group
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float32)
    assert (np.diff(receivers) >= 0).all(), "receivers must be sorted"
    if edge_perm is None:
        edge_perm = np.arange(len(senders), dtype=np.int64)

    gb = receivers // rows_per
    blocks, counts = np.unique(gb, return_counts=True)
    bounds = np.concatenate([[0], np.cumsum(counts)])

    # every output block-group needs ≥1 chunk: a grid that never visits a
    # group leaves its out tile UNINITIALIZED (the out buffer is not zeroed)
    covered = {int(b): i for i, b in enumerate(blocks)}
    all_groups = -(-num_nodes_padded // rows_per)

    s_chunks, r_chunks, w_chunks, e_chunks, bids = [], [], [], [], []
    filler_chunks = []
    for b in range(all_groups):
        if b in covered:
            lo, hi = bounds[covered[b]], bounds[covered[b] + 1]
            e = hi - lo
            n_ch = -(-e // chunk)
            pad = n_ch * chunk - e
            s = np.concatenate([senders[lo:hi],
                                np.full(pad, senders[hi - 1])])  # dup row
            r = np.concatenate([receivers[lo:hi] % rows_per,
                                np.zeros(pad, np.int64)])
            w = np.concatenate([weight[lo:hi], np.zeros(pad, np.float32)])
            ei = np.concatenate([edge_perm[lo:hi],
                                 np.full(pad, edge_perm[hi - 1])])
            fill = np.zeros(n_ch * chunk, dtype=bool)
        else:   # zero-weight filler chunk: writes the group's zeros
            s = np.zeros(chunk, np.int64)
            r = np.zeros(chunk, np.int64)
            w = np.zeros(chunk, np.float32)
            ei = np.zeros(chunk, np.int64)
            fill = np.ones(chunk, dtype=bool)
            n_ch = 1
        s_chunks.append(s)
        r_chunks.append(r)
        w_chunks.append(w)
        e_chunks.append(ei)
        filler_chunks.append(fill)
        bids.extend([b] * n_ch)

    s_all = np.concatenate(s_chunks)
    ei_all = np.concatenate(e_chunks)
    e_total = int(ei_all.max()) + 1 if ei_all.size else 1
    first_slot = np.zeros(e_total, dtype=np.int64)
    # first_slot must map each edge to a REAL slot: filler chunks carry
    # edge_ids == 0, so an uncovered block-group earlier in the stream
    # would otherwise claim edge 0's slot (sender 0 instead of senders[0])
    # and poison dw[0] in the _den backward.  Pad dups inside covered
    # chunks are safe — they duplicate the SAME chunk's last edge, whose
    # real slot always precedes them.
    real_idx = np.nonzero(~np.concatenate(filler_chunks))[0]
    vals, first = np.unique(ei_all[real_idx], return_index=True)
    first_slot[vals] = real_idx[first]
    n_chunks = len(bids)
    aux = np.zeros((n_chunks, 8, chunk), dtype=np.float32)
    aux[:, 0, :] = np.concatenate(r_chunks).reshape(n_chunks, chunk)
    aux[:, 1, :] = np.concatenate(w_chunks).reshape(n_chunks, chunk)
    return SegMM(
        block_ids=jnp.asarray(np.asarray(bids, dtype=np.int32)),
        senders=jnp.asarray(s_all, dtype=jnp.int32),
        aux=jnp.asarray(aux),
        num_nodes=num_nodes_padded,
        first_slot=jnp.asarray(first_slot, dtype=jnp.int32),
        edge_ids=jnp.asarray(ei_all, dtype=jnp.int32),
        group=group)


def _kernel(block_ids_ref, aux_ref, y_ref, o_ref):
    k = pl.program_id(0)
    blk = block_ids_ref[k]
    prev = block_ids_ref[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, blk != prev))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    rloc = aux_ref[0, 0].astype(jnp.int32)     # (CHUNK,)
    w = aux_ref[0, 1]                          # (CHUNK,)
    rows = jax.lax.broadcasted_iota(jnp.int32,
                                    (o_ref.shape[0], rloc.shape[0]), 0)
    sel = jnp.where(rows == rloc[None, :], w[None, :], 0.0)
    y = y_ref[:]                               # (CHUNK, F)
    if y.dtype == jnp.bfloat16:
        sel = sel.astype(jnp.bfloat16)
    o_ref[:] += jnp.dot(sel, y,
                        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_nodes", "group", "interpret"))
def _segmm_scatter(block_ids, aux, y, num_nodes, group=1, interpret=False):
    """out = scatter-add of (chunked) y rows into their out block-groups."""
    n_chunks, _, chunk = aux.shape
    feat = y.shape[-1]
    rows_per = BLOCK * group
    # the grid writes whole (rows_per, feat) tiles: round the out buffer up
    # and slice after (XLA fuses the slice into the consumer)
    n_out = -(-num_nodes // rows_per) * rows_per
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, 8, chunk), lambda k, bids: (k, 0, 0)),
                pl.BlockSpec((chunk, feat), lambda k, bids: (k, 0)),
            ],
            out_specs=pl.BlockSpec((rows_per, feat),
                                   lambda k, bids: (bids[k], 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, feat), y.dtype),
        interpret=interpret,
    )(block_ids, aux, y)
    return out if n_out == num_nodes else out[:num_nodes]


def _kernel_den(block_ids_ref, aux_ref, y_ref, o_ref, d_ref):
    """Selector scatter that ALSO emits the per-row weight sums (= the GAT
    softmax denominator: den[r] = Σ_e pes_e) as selector row-sums — one
    extra VPU reduce per chunk, no separate scalar segment-sum pass."""
    k = pl.program_id(0)
    blk = block_ids_ref[k]
    prev = block_ids_ref[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, blk != prev))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
        d_ref[:] = jnp.zeros_like(d_ref)

    rloc = aux_ref[0, 0].astype(jnp.int32)     # (CHUNK,)
    w = aux_ref[0, 1]                          # (CHUNK,)
    rows = jax.lax.broadcasted_iota(jnp.int32,
                                    (o_ref.shape[0], rloc.shape[0]), 0)
    sel = jnp.where(rows == rloc[None, :], w[None, :], 0.0)
    d_ref[:] += jnp.broadcast_to(jnp.sum(sel, axis=1, keepdims=True),
                                 d_ref.shape).astype(d_ref.dtype)
    y = y_ref[:]                               # (CHUNK, F)
    if y.dtype == jnp.bfloat16:
        sel = sel.astype(jnp.bfloat16)
    o_ref[:] += jnp.dot(sel, y,
                        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_nodes", "group", "interpret"))
def _segmm_scatter_den(block_ids, aux, y, num_nodes, group=1,
                       interpret=False):
    """(num, den) = (scatter-add of y rows, per-row weight sums)."""
    n_chunks, _, chunk = aux.shape
    feat = y.shape[-1]
    rows_per = BLOCK * group
    n_out = -(-num_nodes // rows_per) * rows_per
    out, den = pl.pallas_call(
        _kernel_den,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, 8, chunk), lambda k, bids: (k, 0, 0)),
                pl.BlockSpec((chunk, feat), lambda k, bids: (k, 0)),
            ],
            out_specs=[
                pl.BlockSpec((rows_per, feat), lambda k, bids: (bids[k], 0)),
                pl.BlockSpec((rows_per, 8), lambda k, bids: (bids[k], 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((n_out, feat), y.dtype),
                   jax.ShapeDtypeStruct((n_out, 8), jnp.float32)],
        interpret=interpret,
    )(block_ids, aux, y)
    if n_out != num_nodes:
        out, den = out[:num_nodes], den[:num_nodes]
    return out, den[:, 0]


@jax.custom_vjp
def segmm_weighted_spmm_den(m: SegMM, mt: SegMM, receivers: jnp.ndarray,
                            w_edge: jnp.ndarray, x: jnp.ndarray) -> tuple:
    """(num, den): num[r] = Σ_e w[e]·x[s_e], den[r] = Σ_e w[e] — the GAT
    straggler numerator AND softmax denominator in ONE selector pass (the
    denominator is the selector's row sums; round-2 VERDICT next-step #2).

    Backward differs from ``segmm_weighted_spmm`` in two ways: the gathered
    stream ``y`` is SAVED (no x re-gather), and dw folds the den cotangent
    in node-locally (dw_e = ⟨g_num[r_e], y_e⟩ + g_den[r_e])."""
    from fitgnn_tpu.ops.segment import take_rows
    y = take_rows(x, m.senders)
    num, den = _segmm_scatter_den(m.block_ids, _dyn_aux(m, w_edge), y,
                                  m.num_nodes, group=m.group,
                                  interpret=_use_interpret())
    return num, den


def _segmm_den_fwd(m, mt, receivers, w_edge, x):
    from fitgnn_tpu.ops.segment import take_rows
    y = take_rows(x, m.senders)
    num, den = _segmm_scatter_den(m.block_ids, _dyn_aux(m, w_edge), y,
                                  m.num_nodes, group=m.group,
                                  interpret=_use_interpret())
    return (num, den), (m, mt, receivers, w_edge, y)


def _segmm_den_bwd(res, ct):
    m, mt, receivers, w_edge, y = res
    g_num, g_den = ct
    from fitgnn_tpu.ops.segment import take_rows
    yt = take_rows(g_num, mt.senders)
    dx = _segmm_scatter(mt.block_ids, _dyn_aux(mt, w_edge), yt,
                        mt.num_nodes, group=mt.group,
                        interpret=_use_interpret())
    # y is in SLOT order (padded selector slots); m.first_slot maps each
    # forward edge to its real slot, so gathering y there reproduces
    # x[senders] in edge order WITHOUT re-reading x
    gr = take_rows(g_num, receivers, sorted_idx=True).astype(jnp.float32)
    ys = take_rows(y, m.first_slot).astype(jnp.float32)
    dw = (jnp.sum(gr * ys, axis=-1)
          + take_rows(g_den, receivers,
                      sorted_idx=True).astype(jnp.float32)
          ).astype(w_edge.dtype)
    return None, None, None, dw, dx



segmm_weighted_spmm_den.defvjp(_segmm_den_fwd, _segmm_den_bwd)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def segmm_spmm(m: SegMM, x: jnp.ndarray) -> jnp.ndarray:
    """out = A·x for the straggler edges (gather in XLA, scatter on MXU)."""
    from fitgnn_tpu.ops.segment import take_rows
    y = take_rows(x, m.senders)  # (E_pad, F) stream; BlockSpec per chunk
    return _segmm_scatter(m.block_ids, m.aux, y, m.num_nodes,
                          group=m.group, interpret=_use_interpret())


def _dyn_aux(m: SegMM, w_edge: jnp.ndarray) -> jnp.ndarray:
    """aux with row 1 = dynamic per-edge weight (canonical order) remapped
    to slot order, times the static build weight (1 on real slots, 0 on
    padding/filler — so padding slots stay inert)."""
    n_chunks, _, chunk = m.aux.shape
    from fitgnn_tpu.ops.segment import take_rows
    ws = (take_rows(w_edge, m.edge_ids).astype(m.aux.dtype)
          * m.aux[:, 1, :].reshape(-1))
    return m.aux.at[:, 1, :].set(ws.reshape(n_chunks, chunk))


@jax.custom_vjp
def segmm_weighted_spmm(m: SegMM, mt: SegMM, senders: jnp.ndarray,
                        receivers: jnp.ndarray, w_edge: jnp.ndarray,
                        x: jnp.ndarray) -> jnp.ndarray:
    """out[r] = Σ_e w[e]·x[s_e] with DYNAMIC per-edge weights on the MXU
    selector (the GAT straggler aggregation: w = softmax numerators).

    ``m``/``mt`` are the forward/transpose SegMM structures (``mt`` built
    with ``edge_perm`` mapping back to the forward list); ``senders``/
    ``receivers``/``w_edge`` are in forward (receiver-sorted) edge order.
    Differentiable in ``w_edge`` and ``x``: dx rides the transpose
    selector-scatter, dw is the per-edge SDDMM ⟨g[r], x[s]⟩."""
    from fitgnn_tpu.ops.segment import take_rows
    y = take_rows(x, m.senders)
    return _segmm_scatter(m.block_ids, _dyn_aux(m, w_edge), y, m.num_nodes,
                          group=m.group, interpret=_use_interpret())


def _segmm_weighted_fwd(m, mt, senders, receivers, w_edge, x):
    return segmm_weighted_spmm(m, mt, senders, receivers, w_edge, x), (
        m, mt, senders, receivers, w_edge, x)


def _segmm_weighted_bwd(res, g):
    m, mt, senders, receivers, w_edge, x = res
    from fitgnn_tpu.ops.segment import take_rows
    yt = take_rows(g, mt.senders)
    dx = _segmm_scatter(mt.block_ids, _dyn_aux(mt, w_edge), yt,
                        mt.num_nodes, group=mt.group,
                        interpret=_use_interpret())
    dw = jnp.sum(take_rows(g, receivers, sorted_idx=True
                           ).astype(jnp.float32)
                 * take_rows(x, senders).astype(jnp.float32), axis=-1
                 ).astype(w_edge.dtype)
    return None, None, None, None, dw, dx


segmm_weighted_spmm.defvjp(_segmm_weighted_fwd, _segmm_weighted_bwd)
