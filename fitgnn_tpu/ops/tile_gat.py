"""Tile-dense GAT attention on the hybrid BCSR/COO structure.

The per-edge GAT formulation (gather scores → segment-softmax → gather
rows → scatter) is row-rate-bound on TPU: every step touches E random
rows several times.  On a community-reordered graph most edges live in
dense adjacency tiles, where attention has a flash-attention-like dense
form with NO per-edge materialization:

* tile scores   ``E_t[i,j] = LeakyReLU(s_dst[row_i] + s_src[col_j])`` —
  an outer broadcast over the tile, masked by the static adjacency tile;
* the softmax max/denominator reduce over tile rows (VPU) + a segment
  combine over the few tiles per block-row;
* the weighted aggregation is a batched ``(b,b)@(b,F)`` einsum (MXU).

Only the straggler edges keep the per-edge path.  Numerics follow the
standard max-subtracted softmax with the max treated as a constant
(``stop_gradient``), exactly like ``ops.segment.segment_softmax``.

Semantics match ``models.layers.GATConv``'s per-edge path (reference
PyG GATConv, ``network.py:13``): scores over incoming edges per receiver,
self-loops included.  Exactness is gated by ``tests/test_tile_gat.py``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Sorted-backward straggler primitives: measured SLOWER than XLA autodiff
# on the bench graph (85.0 ms autodiff vs 88.0/89.6/92.2 ms with the
# NUM/SRC/both custom VJPs) — XLA fuses the gather+mul+scatter chains
# across the backward better than the decomposed sorted passes, so the
# opt-ins default OFF and exist as diagnostics.
_SORTED_SRC = os.environ.get("FITGNN_GAT_SORTED_SRC", "0") == "1"
_SORTED_NUM = os.environ.get("FITGNN_GAT_SORTED_NUM", "0") == "1"
# Width gate for the dynamic-weight MXU selector-scatter (segmm) straggler
# numerator.  Its backward re-gathers x[senders] and scatters the scalar
# score grads, so at f=128 it LOSES to the y-reuse segment_sum path
# (bench GAT: 70.6 ms segmm vs 63.2 ms without); it stays on only for
# genuinely narrow aggregations (the hidden→classes layer, f≈40).
_SEGMM_MAX_F = int(os.environ.get("FITGNN_GAT_SEGMM_MAXF", "64"))
# Denominator-in-selector (round-2 VERDICT next-step #2): route the GAT
# straggler numerator AND softmax denominator through ONE augmented MXU
# selector pass (den = selector row-sums) at ANY width, with a saved-y
# backward (no x re-gather).  Replaces both big row ops (the (E, F+1) aug
# scatter forward and the unsorted dh scatter backward) with selector
# matmuls.
_SEGMM_DEN = os.environ.get("FITGNN_GAT_SEGMM_DEN", "0") == "1"
# Fused tile-attention kernels (ops/pallas/att_bsr.py): recompute tile
# scores in-kernel from the per-node score vectors instead of
# materializing the (K,b,b) e/pe tensors (~143 MB each at bench scale)
# in HBM between XLA and the dynamic-BSR kernel.  Measured SLOWER on the
# bench graph (67.7 ms vs 62.0 two-stage): at ~1.7 tiles per block-row
# the tile walk is per-grid-step-overhead-bound, and the fused design
# pays 4 walks (rowmax/fwd/bwd_t/bwd_f) where the two-stage path pays 2
# plus XLA streams that run at full rate.  Kept as an opt-in.
_FUSED_TILES = os.environ.get("FITGNN_GAT_FUSED_TILES", "0") == "1"
# Global-bound softmax stabilizer: m̂[r] = max(0, sdst[r] + max(ssrc))
# instead of the exact per-receiver segment_max.  Softmax is
# shift-invariant, so any per-row UPPER bound stabilizes it exactly; the
# bound removes the serial-scatter segment_max, the (E,) gather of m, and
# the tile rowmax pass (device trace: together ~8 ms/step of the GAT
# bench).  Trade-off: edges whose score sits >87 nats below the row bound
# underflow to weight 0 (softmax would give them ~e-38 anyway).
_GLOBAL_MAX = os.environ.get("FITGNN_GAT_GLOBAL_MAX", "1") == "1"

_NEG = -1e30  # "minus infinity" that survives exp/where without NaNs


# ---------------------------------------------------------------------------
# Sorted-backward primitives for the straggler per-edge path.
#
# Autodiff of ``v[senders]`` / ``segment_sum(..., receivers)`` emits UNSORTED
# scatter-adds (XLA cannot know the index order), which run at a fraction of
# the sorted rate on TPU.  Both straggler edge lists are pre-sorted (forward
# by receiver, transpose by sender) and ``t_edge_perm`` maps per-edge data
# between the orders — so every backward scatter can ride the sorted list.
# In practice XLA's fused autodiff chains beat these decomposed passes on
# the bench graph (see knob comment below) — they stay as opt-ins.
# ---------------------------------------------------------------------------


def _cluster_src_scores(aux, score_src):
    """(C,) sender scores of the cluster-summary rows: means commute with
    the linear score projection, so the summary's score IS the cluster mean
    of the per-node scores (padding rows excluded via the member mask)."""
    K = aux.cluster_size
    C = aux.num_nodes // K
    member = aux.cluster_member.astype(jnp.float32)
    return ((score_src.astype(jnp.float32) * member).reshape(C, K).sum(1)
            * aux.cluster_scale)


def _take_rows(a, idx, sorted_idx=False):
    """Gather rows with an in-bounds promise (no FILL_OR_DROP guard) and an
    optional sorted-indices hint.  ``jnp.take``'s default mode wraps the
    gather in negative-index selects and a NaN-fill guard; plain ``a[idx]``
    loses the sorted hint."""
    return a.at[idx].get(mode="clip", indices_are_sorted=sorted_idx)


@jax.custom_vjp
def _gather_senders(aux, v):
    """v[senders] whose backward scatter rides the SORTED transpose list."""
    return _take_rows(v, aux.senders)


def _gather_senders_fwd(aux, v):
    return _gather_senders(aux, v), aux


def _gather_senders_bwd(aux, g):
    dv = jax.ops.segment_sum(_take_rows(g, aux.t_edge_perm),
                             aux.t_receivers, num_segments=aux.num_nodes,
                             indices_are_sorted=True)
    return None, dv


_gather_senders.defvjp(_gather_senders_fwd, _gather_senders_bwd)


@jax.custom_vjp
def _weighted_spmm_sorted(aux, w, x):
    """out[r] = Σ_e w[e]·x[s_e] with both backward scatters sorted:
    dx rides the transpose list, dw is a rowwise dot of sorted gathers."""
    y = _take_rows(x, aux.senders)
    return jax.ops.segment_sum(y * w[:, None].astype(x.dtype),
                               aux.receivers, num_segments=aux.num_nodes,
                               indices_are_sorted=True)


def _weighted_spmm_sorted_fwd(aux, w, x):
    y = _take_rows(x, aux.senders)              # saved: avoids the bwd
    out = jax.ops.segment_sum(y * w[:, None].astype(x.dtype),
                              aux.receivers, num_segments=aux.num_nodes,
                              indices_are_sorted=True)
    return out, (aux, w, y)


def _weighted_spmm_sorted_bwd(res, g):
    aux, w, y = res
    wt = _take_rows(w, aux.t_edge_perm)
    gt = _take_rows(g, aux.t_senders)
    dx = jax.ops.segment_sum(gt * wt[:, None].astype(g.dtype),
                             aux.t_receivers, num_segments=aux.num_nodes,
                             indices_are_sorted=True)
    gr = _take_rows(g, aux.receivers, sorted_idx=True)
    dw = jnp.sum(gr.astype(jnp.float32) * y.astype(jnp.float32),
                 axis=-1).astype(w.dtype)
    return None, dw, dx


_weighted_spmm_sorted.defvjp(_weighted_spmm_sorted_fwd,
                             _weighted_spmm_sorted_bwd)


# ---------------------------------------------------------------------------
# Fused-backward straggler attention (the production per-edge softmax path).
#
# Device traces show the straggler block's cost is dominated by per-edge
# SCALAR plumbing: the denominator segment-sum, the backward score
# segment-sum, and their (N,)→(E,) gathers each run at serial per-edge
# rates (~8 ns/edge) while the (E, F) row streams they sit between are
# row-rate-bound and insensitive to width.  This block removes ALL of the
# scalar segment ops:
#
# * forward: ONE augmented row scatter  Σ_e pes·[y | 1 | lp·y | lp]
#   → [num | den | num' | den'] where lp = LeakyReLU'(pre).  den rides as
#   an extra column; num'/den' are residuals for the closed-form backward.
# * backward: dL/dsdst[r] = Σ_e pes·lp·(⟨y_e, dnum[r]⟩ + dden[r])
#   = ⟨num'[r], dnum[r]⟩ + den'[r]·dden[r]  — NODE-LOCAL, no scatter;
#   dh rides one row gather (dnum_aug per edge) + the sorted transpose
#   row scatter; da_src is one multiply-reduce over the saved y stream.
#
# Requires the global-bound stabilizer (m̂ is a stop-gradient constant) and
# sender scores derived from the gathered rows (ssrc = y·a_src).
# ---------------------------------------------------------------------------
# Measured SLOWER than autodiff of the den-column path on the bench graph
# (48.4 ms unsorted-dh / 48.3 sorted-dh vs 47.2 autodiff): the wider
# (E, 2F+2) forward scatter + the standalone dy construction cost more
# than the two scalar segment-sums they replace — XLA's autodiff chains
# fuse the scalar scatter into passes this decomposition pays separately.
# Kept as a diagnostic opt-in.
_FUSED_BWD = os.environ.get("FITGNN_GAT_FUSED_BWD", "0") == "1"
_FUSED_BWD_SORTED_DH = os.environ.get("FITGNN_GAT_FUSED_SORTED_DH",
                                      "0") == "1"


def _strag_core(aux, sm, h, score_dst, a_src, maxs, slope):
    f = h.shape[-1]
    y = _take_rows(h, aux.senders)                         # (E, F)
    ssrc = jnp.einsum("ef,f->e", y.astype(jnp.float32),
                      a_src.astype(jnp.float32))
    sdst = _take_rows(score_dst.astype(jnp.float32), aux.receivers,
                      sorted_idx=True)
    pre = ssrc + sdst
    es = jnp.where(pre >= 0, pre, slope * pre)
    m_e = jnp.maximum(sdst + maxs, 0.0)                    # stop-grad bound
    pes = jnp.exp(jnp.where(sm, es, _NEG) - m_e) * sm
    lp = jnp.where(pre >= 0, 1.0, slope) * sm              # LeakyReLU'
    pc = pes[:, None].astype(h.dtype)
    plc = (pes * lp)[:, None].astype(h.dtype)
    aug = jnp.concatenate([y * pc, pc, y * plc, plc], axis=1)
    s = jax.ops.segment_sum(aug, aux.receivers, num_segments=aux.num_nodes,
                            indices_are_sorted=True)       # (N, 2F+2)
    num = s[:, :f]
    den = s[:, f].astype(jnp.float32)
    nump = s[:, f + 1:2 * f + 1]
    denp = s[:, 2 * f + 1].astype(jnp.float32)
    return num, den, nump, denp, y, pes, lp


@jax.custom_vjp
def _straggler_attention_fused(aux, sm, h, score_dst, a_src, maxs,
                               slope) -> tuple:
    num, den, *_ = _strag_core(aux, sm, h, score_dst, a_src, maxs, slope)
    return num, den


def _strag_fused_fwd(aux, sm, h, score_dst, a_src, maxs, slope):
    num, den, nump, denp, y, pes, lp = _strag_core(
        aux, sm, h, score_dst, a_src, maxs, slope)
    # dtype tokens ride as empty arrays (raw np.dtype objects are not
    # valid JAX residual types)
    return (num, den), (aux, y, pes, lp, nump, denp, a_src,
                        jnp.zeros((0,), h.dtype),
                        jnp.zeros((0,), score_dst.dtype))


def _strag_fused_bwd(res, ct):
    aux, y, pes, lp, nump, denp, a_src, htok, stok = res
    hdt, sdt = htok.dtype, stok.dtype
    dnum, dden = ct
    f = y.shape[-1]
    gaug = jnp.concatenate([dnum, dden[:, None].astype(dnum.dtype)], axis=1)
    g_e = _take_rows(gaug, aux.receivers, sorted_idx=True)   # (E, F+1)
    t_e = (jnp.sum(g_e[:, :f].astype(jnp.float32)
                   * y.astype(jnp.float32), axis=-1)
           + g_e[:, f].astype(jnp.float32))                  # dL/dpes
    dpre = pes * lp * t_e
    dsdst = (jnp.sum(nump.astype(jnp.float32) * dnum.astype(jnp.float32),
                     axis=-1)
             + denp * dden.astype(jnp.float32))              # node-local
    da_src = jnp.einsum("e,ef->f", dpre, y.astype(jnp.float32))
    dy = (pes[:, None].astype(hdt) * g_e[:, :f].astype(hdt)
          + dpre[:, None].astype(hdt) * a_src.astype(hdt)[None, :])
    if _FUSED_BWD_SORTED_DH:
        dh = jax.ops.segment_sum(_take_rows(dy, aux.t_edge_perm),
                                 aux.t_receivers,
                                 num_segments=aux.num_nodes,
                                 indices_are_sorted=True)
    else:
        # direct unsorted scatter: XLA fuses the dy construction into the
        # scatter reads, where the permuted-sorted variant pays a full
        # (E, F) row gather first
        dh = jax.ops.segment_sum(dy, aux.senders,
                                 num_segments=aux.num_nodes)
    return (None, None, dh, dsdst.astype(sdt), da_src.astype(a_src.dtype),
            None, None)


_straggler_attention_fused.defvjp(_strag_fused_fwd, _strag_fused_bwd)


def tile_gat_attention(aux, score_src: jnp.ndarray, score_dst: jnp.ndarray,
                       h: jnp.ndarray, negative_slope: float,
                       att_src: jnp.ndarray | None = None,
                       partials: bool = False,
                       src_score_bound: jnp.ndarray | None = None,
                       extra_rowmax: jnp.ndarray | None = None):
    """Single-head GAT aggregation through ``aux`` (a HybridSpmm with
    ``semantics='att_unit'``: presence tiles + straggler edge lists).

    ``score_src``/``score_dst``: (N,) per-node attention projections;
    ``h``: (N, F) transformed features.  ``att_src``: the (F,) attention
    vector — when given, straggler sender scores are derived from the
    gathered message rows (``(h[senders])·a_src``) instead of a per-edge
    scalar gather of ``score_src``: the rows are fetched for the numerator
    anyway, so the unsorted 4-byte-row gather (row-rate-bound) and its
    backward scalar scatter disappear; the score gradient rides the
    message rows' vectorized path.  Returns (N, F).

    ``partials=True`` returns the pre-normalization ``(num, den, m)``
    triple instead, so a caller can fold in edges this operator does not
    see (the hierarchical layer's halo/summary edges) before normalizing —
    the softmax then spans ALL of a receiver's edges exactly.  For that to
    be safe the stabilizer must bound the external scores too:
    ``src_score_bound`` overrides the global-max bound's ``max(score_src)``
    (pass the max over every sender table), and ``extra_rowmax`` folds a
    (N,) per-receiver bound into the exact-max branch."""
    bsr = aux.bsr
    n = aux.num_nodes
    f = h.shape[-1]

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    # ---- straggler per-edge scores (receiver-sorted lists) --------------
    sm = aux.weights > 0
    sorted_bwd = getattr(aux, "t_edge_perm", None) is not None
    use_segmm_den = (_SEGMM_DEN and aux.segmm is not None
                     and aux.segmm.edge_ids is not None)
    use_segmm = (aux.segmm is not None and aux.segmm.edge_ids is not None
                 and f <= _SEGMM_MAX_F and not use_segmm_den)
    use_fused_bwd = (_FUSED_BWD and _GLOBAL_MAX and att_src is not None
                     and sorted_bwd and not use_segmm and not use_segmm_den
                     and not _SORTED_NUM and not _SORTED_SRC
                     and not _FUSED_TILES and not partials)
    if use_fused_bwd:
        # one augmented row scatter for num+den (+ the leaky'-weighted
        # num'/den' residuals); ALL per-edge scalar segment ops disappear
        # from forward and backward (see _straggler_attention_fused)
        maxs = jax.lax.stop_gradient(jnp.max(score_src.astype(jnp.float32)))
        m = jax.lax.stop_gradient(
            jnp.maximum(score_dst.astype(jnp.float32) + maxs, 0.0))
        num, den = _straggler_attention_fused(aux, sm, h, score_dst,
                                              att_src, maxs,
                                              float(negative_slope))
        return _finish_tiles(aux, score_src, score_dst, h, negative_slope,
                             m, num, den)
    y = None
    if (att_src is not None and not use_segmm and not use_segmm_den
            and not (sorted_bwd and _SORTED_NUM)):
        y = _take_rows(h, aux.senders)              # reused by the numerator
        ssrc_e = jnp.einsum("ef,f->e", y.astype(jnp.float32),
                            att_src.astype(jnp.float32))
    elif sorted_bwd and _SORTED_SRC:
        ssrc_e = _gather_senders(aux, score_src)
    else:
        ssrc_e = _take_rows(score_src, aux.senders)
    sdst_e = _take_rows(score_dst, aux.receivers, sorted_idx=True)
    es = leaky(ssrc_e + sdst_e)
    es = jnp.where(sm, es, _NEG)

    fused = (bsr is not None and getattr(aux, "dyn_plan", None) is not None
             and f <= 512 and _FUSED_TILES)
    if _GLOBAL_MAX:
        # Softmax is shift-invariant per receiver, so ANY per-row upper
        # bound works as the stabilizer — it need not be the exact max.
        # e[r,s] = LeakyReLU(sdst[r] + ssrc[s]) ≤ max(0, sdst[r] + max ssrc),
        # so m̂[r] = max(0, sdst[r] + max_all(ssrc)) bounds every row with
        # ONE global reduction: no per-edge segment_max (~2 ms serial
        # scatter at bench scale), no (E,) gather of m (the bound comes
        # straight from the already-gathered sdst_e), and no tile rowmax
        # pass (which materialized the (K,b,b) score tensor in XLA).
        # Edges whose true score sits far below the row bound underflow
        # exp() to 0 — exactly the weights softmax would send to ~0 anyway.
        maxs = (jnp.asarray(src_score_bound, jnp.float32)
                if src_score_bound is not None
                else jnp.max(score_src.astype(jnp.float32)))
        maxs = jax.lax.stop_gradient(maxs)
        m = jax.lax.stop_gradient(
            jnp.maximum(score_dst.astype(jnp.float32) + maxs, 0.0))
        m_e = jax.lax.stop_gradient(jnp.maximum(sdst_e + maxs, 0.0))
    else:
        m = jax.ops.segment_max(es, aux.receivers, num_segments=n,
                                indices_are_sorted=True)
        if fused:
            from fitgnn_tpu.ops.pallas.att_bsr import att_rowmax
            from fitgnn_tpu.ops.pallas.att_bsr import _use_interpret as _ai
            # the softmax max is a constant (stop_gradient, like
            # segment_softmax): stop the score tangents HERE so AD never
            # traces the rowmax kernel
            m_tiles = att_rowmax(bsr.rows, bsr.cols, bsr.blocks,
                                 jax.lax.stop_gradient(
                                     score_src.astype(jnp.float32)),
                                 jax.lax.stop_gradient(
                                     score_dst.astype(jnp.float32)),
                                 bsr.block, float(negative_slope),
                                 interpret=_ai())
            m = jnp.maximum(m, m_tiles)
        elif bsr is not None:
            b = bsr.block
            nb = n // b
            rows, cols = bsr.rows, bsr.cols
            mask = bsr.blocks > 0                   # (K,b,b) static adjacency
            ssrc = score_src.reshape(nb, b)[cols]   # (K,b) sender scores
            sdst = score_dst.reshape(nb, b)[rows]   # (K,b) receiver scores
            e = leaky(sdst[:, :, None] + ssrc[:, None, :])
            e = jnp.where(mask, e, _NEG)
            tile_rowmax = jnp.max(e, axis=2)        # (K,b)
            m_tiles = jax.ops.segment_max(tile_rowmax, rows,
                                          num_segments=nb,
                                          indices_are_sorted=True)
            m = jnp.maximum(m, m_tiles.reshape(n))
        if getattr(aux, "diag_blocks", None) is not None:
            # Diagonal tiles carry in-edges too: a dense-community interior
            # node may have ALL its edges here, so m must fold in the
            # diag-tile row maxima or _finish_tiles exponentiates
            # e_d - (-1e30) = inf for its real edges (same hazard the BSR
            # branch above guards with m_tiles).
            bd = aux.diag_blocks.shape[-1]
            nbd = n // bd
            maskd = aux.diag_blocks > 0
            sdd = score_dst.reshape(nbd, bd)
            ssd = score_src.reshape(nbd, bd)
            e_d = jnp.where(maskd,
                            leaky(sdd[:, :, None] + ssd[:, None, :]), _NEG)
            m = jnp.maximum(m, jnp.max(e_d, axis=2).reshape(n))
        if getattr(aux, "cluster_count", None) is not None:
            # cluster-summary rows carry in-edges too (same hazard as the
            # diag/BSR folds above)
            ssrc_c = _cluster_src_scores(aux, score_src)
            e_c = jnp.where(aux.cluster_count > 0,
                            leaky(score_dst.astype(jnp.float32)[:, None]
                                  + ssrc_c[None, :]), _NEG)
            m = jnp.maximum(m, jnp.max(e_c, axis=1))
        if extra_rowmax is not None:
            # external edges (e.g. hierarchical halo/summary) share this
            # receiver's softmax: their row maxima must bound m too
            m = jnp.maximum(m, extra_rowmax.astype(jnp.float32))
        m = jax.lax.stop_gradient(jnp.maximum(m, _NEG))
        m_e = _take_rows(m, aux.receivers, sorted_idx=True)

    # ---- straggler numerator/denominator --------------------------------
    pes = jnp.exp(es - m_e) * sm
    if use_segmm_den:
        from fitgnn_tpu.ops.pallas.coo_segmm import segmm_weighted_spmm_den
        num, den = segmm_weighted_spmm_den(aux.segmm, aux.t_segmm,
                                           aux.receivers, pes, h)
    elif use_segmm:
        # MXU selector-scatter with the softmax numerators as dynamic
        # per-edge selector weights (same bf16 rounding of α as the
        # segment_sum path's ``astype(h.dtype)``).  Gated to narrow
        # features: the kernel re-reads the gathered message stream from
        # HBM, which at F=512 costs more than the scatter it saves
        # (measured: GAT step 102.7 ms segmm vs 93.6 ms segment_sum).
        from fitgnn_tpu.ops.pallas.coo_segmm import segmm_weighted_spmm
        num = segmm_weighted_spmm(aux.segmm, aux.t_segmm, aux.senders,
                                  aux.receivers, pes, h)
        den = jax.ops.segment_sum(pes, aux.receivers, num_segments=n,
                                  indices_are_sorted=True)
    elif sorted_bwd and _SORTED_NUM:
        num = _weighted_spmm_sorted(aux, pes, h)
        den = jax.ops.segment_sum(pes, aux.receivers, num_segments=n,
                                  indices_are_sorted=True)
    else:
        if y is None:
            y = h[aux.senders]
        # denominator rides the numerator scatter as an extra column:
        # the (E, F) row scatter is ROW-RATE-bound (~29 ns/row at F=512,
        # device trace), so one more lane block is nearly free, while a
        # standalone (E,)→(N,) scalar segment-sum costs ~1.9 ms serial
        # (~8.8 ns/edge).  rows = [pes·y | pes] ⇒ out = [num | den].
        pcol = pes[:, None].astype(h.dtype)
        aug = jnp.concatenate([y * pcol, pcol], axis=1)
        num_aug = jax.ops.segment_sum(aug, aux.receivers, num_segments=n,
                                      indices_are_sorted=True)
        num = num_aug[:, :f]
        den = num_aug[:, f].astype(jnp.float32)

    return _finish_tiles(aux, score_src, score_dst, h, negative_slope, m,
                         num, den, fused=fused, partials=partials)


def _finish_tiles(aux, score_src, score_dst, h, negative_slope, m, num, den,
                  fused: bool = False, partials: bool = False):
    """Add the tile-dense attention contributions to the straggler
    (num, den) partials and normalize."""
    bsr = aux.bsr
    n = aux.num_nodes
    f = h.shape[-1]

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    if getattr(aux, "diag_blocks", None) is not None:
        # Block-DIAGONAL attention tiles: out rows == block rows, so the
        # whole contribution is one batched einsum over CONTIGUOUS X/out
        # slabs — no gather, no scatter, no segment op, no Pallas walk
        # (the attention analog of ops/pallas/diag_spmm.py's insight).
        # XLA fuses score construction + exp into the matmul operands.
        b = aux.diag_blocks.shape[-1]
        nb = n // b
        maskd = aux.diag_blocks > 0                  # static adjacency
        sd = score_dst.reshape(nb, b)
        ss = score_src.reshape(nb, b)
        e_d = jnp.where(maskd, leaky(sd[:, :, None] + ss[:, None, :]), _NEG)
        pe_d = jnp.exp(e_d - m.reshape(nb, b)[:, :, None])
        pe_d = jnp.where(maskd, pe_d, 0.0)
        xb = h.reshape(nb, b, f)
        num = num + jnp.einsum("bij,bjf->bif", pe_d.astype(h.dtype),
                               xb).reshape(n, f).astype(num.dtype)
        den = den + jnp.sum(pe_d, axis=2).reshape(n)

    if getattr(aux, "cluster_count", None) is not None:
        # Cluster-factorized remote attention: every (absent) straggler
        # edge attends to its sender's cluster-summary row instead — one
        # dense (N, C) score block + an (N, C)@(C, F) MXU matmul replace
        # the per-edge gather/scatter path.  Duplicate edges from one
        # cluster share the summary's score, so multiplying the softmax
        # numerator by the count reproduces per-edge-on-summary semantics
        # EXACTLY (parallel/hierarchical.py's summary treatment, the
        # reference's cluster_node idea, utils.py:191-232).
        # The _GLOBAL_MAX bound already covers these scores: the summary
        # score is a mean of member scores ≤ max(score_src).
        K = aux.cluster_size
        C = n // K
        member = aux.cluster_member.astype(jnp.float32)
        ssrc_c = _cluster_src_scores(aux, score_src)          # (C,)
        cnt = aux.cluster_count                               # (N, C)
        # mask BEFORE the exp (same NaN hazard as the BSR branch below):
        # exp on a masked over-m entry saves an inf the where-VJP turns
        # into 0·inf; masked-to-_NEG scores keep every exponent ≤ 0
        e_c = jnp.where(cnt > 0,
                        leaky(score_dst.astype(jnp.float32)[:, None]
                              + ssrc_c[None, :]), _NEG)
        pe_c = jnp.exp(e_c - m[:, None]) * cnt.astype(jnp.float32)
        hs = ((h.astype(jnp.float32) * member[:, None])
              .reshape(C, K, f).sum(1)
              * aux.cluster_scale[:, None]).astype(h.dtype)   # (C, F)
        num = num + (pe_c.astype(h.dtype) @ hs).astype(num.dtype)
        den = den + jnp.sum(pe_c, axis=1)

    if fused:
        from fitgnn_tpu.ops.pallas.att_bsr import att_tiles
        num_t, den_t = att_tiles(bsr.block, float(negative_slope),
                                 bsr.rows, bsr.cols, aux.dyn_plan,
                                 bsr.blocks, score_src.astype(jnp.float32),
                                 score_dst.astype(jnp.float32), m, h)
        num = num + num_t.astype(num.dtype)
        den = den + den_t
    elif bsr is not None:
        b = bsr.block
        nb = n // b
        rows, cols = bsr.rows, bsr.cols
        mask = bsr.blocks > 0                       # (K,b,b) static adjacency
        ssrc = score_src.reshape(nb, b)[cols]       # (K,b) sender scores
        sdst = score_dst.reshape(nb, b)[rows]       # (K,b) receiver scores
        # mask BEFORE the exp: an edgeless row has m = _NEG, and
        # exp(raw_e + 1e30) = inf on its masked entries would turn the
        # where-VJP's 0 upstream into 0·inf = NaN score gradients
        e = jnp.where(mask, leaky(sdst[:, :, None] + ssrc[:, None, :]), _NEG)
        mrow = m.reshape(nb, b)[rows]               # (K,b)
        pe = jnp.exp(e - mrow[:, :, None])
        pe = jnp.where(mask, pe, 0.0)
        if getattr(aux, "dyn_plan", None) is not None:
            # VMEM-accumulating MXU walk with the attention numerators as
            # DYNAMIC tile values — replaces the einsum + slab segment-sum
            # (which XLA lowers to a ~3 µs/tile scalar scatter)
            from fitgnn_tpu.ops.pallas.bsr_dynamic import bsr_spmm_dyn
            num = num + bsr_spmm_dyn(bsr.rows, bsr.cols, aux.dyn_plan,
                                     pe.astype(h.dtype), h)
        else:
            hb = h.reshape(nb, b, f)[cols]          # (K,b,F) block gather
            num_t = jnp.einsum("kij,kjf->kif", pe.astype(h.dtype), hb)
            num = num + jax.ops.segment_sum(
                num_t, rows, num_segments=nb,
                indices_are_sorted=True).reshape(n, f)
        den = den + jax.ops.segment_sum(
            jnp.sum(pe, axis=2), rows, num_segments=nb,
            indices_are_sorted=True).reshape(n)

    if partials:
        return num, den, m
    den = jnp.maximum(den, 1e-16).astype(h.dtype)
    return num / den[:, None]
