"""Fused tile-attention BSR kernels: GAT dense-tile softmax with NO
per-tile score materialization in HBM.

The two-stage tile-GAT path (``ops/tile_gat.py``) computes the (K, b, b)
score tensors ``e = LeakyReLU(s_dst ⊕ s_src)`` and ``pe = exp(e − m)·mask``
in XLA before handing ``pe`` to the dynamic-block BSR kernel
(``bsr_dynamic.py``).  At K≈2200, b=128 that is ~143 MB per tensor, each
written and re-read several times across forward + backward — the tile
path's cost is dominated by streaming softmax intermediates, not by the
MXU work (PERFORMANCE.md round-2 GAT ablations).

These kernels instead recompute the tile scores ON THE FLY inside each
grid step from the per-node score vectors (a few hundred KB) and the
static presence tiles:

* ``att_rowmax``      — per-out-block running max of masked tile scores
                        (the softmax max pass);
* ``att_fwd``         — numerator ``Σ_k pe[k] @ x[cols[k]]`` and
                        denominator row-sums, one walk, VMEM-accumulated;
* ``att_bwd_t``       — ``dx`` via the transpose-order plan (in-kernel
                        tile transpose) plus ``d_ssrc`` (column sums of
                        the recomputed ``d_raw``);
* ``att_bwd_f``       — ``d_sdst`` (row sums of ``d_raw``) on a
                        forward-order walk.

HBM traffic per pass = static presence tiles + feature slabs only; the
(K, b, b) intermediates never exist.  Per-node vectors ride an
8-sublane-REPLICATED (nb, 8, b) layout: Mosaic requires the last two
block dims divisible by (8, 128), so a (1, b) vector block is illegal —
each vector is broadcast across 8 sublanes host-side (a few MB) and the
kernels read sublane 0.  Semantics gated against the XLA two-stage path
by ``tests/test_att_bsr.py``.  Reference hot loop: PyG GATConv per-edge
softmax (``network.py:13``).

Requires F ≤ 512 (single feature step per tile walk — GAT widths here are
≤ 512; wider falls back to the two-stage path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_R = 8          # sublane replication of per-node vectors


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rep8(v: jnp.ndarray, nb: int, b: int) -> jnp.ndarray:
    """(n,) → (nb, 8, b) with the vector replicated across sublanes."""
    return jnp.broadcast_to(v.reshape(nb, 1, b), (nb, _R, b))


def _row(ref):
    """(1, 8, b) vector block → (1, b) row (sublane 0)."""
    return ref[0][0:1, :]


def _col(ref):
    """(1, 8, b) vector block → (b, 1) column (transpose, sublane 0)."""
    return ref[0].T[:, 0:1]


def _pe_tile(blk, sdst_col, ssrc_row, m_col, slope):
    """Recompute ``pe`` for one tile: (b, b) from resident score vectors."""
    raw = sdst_col + ssrc_row
    e = jnp.where(raw >= 0, raw, slope * raw)
    return jnp.where(blk != 0, jnp.exp(e - m_col), 0.0)


def _rowmax_kernel(slope, rows_ref, cols_ref, blk_ref, ssrc_ref, sdst_ref,
                   o_ref):
    k = pl.program_id(0)
    row = rows_ref[k]
    prev = rows_ref[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, row != prev))
    def _():
        o_ref[...] = jnp.full_like(o_ref, _NEG)

    raw = _col(sdst_ref) + _row(ssrc_ref)
    e = jnp.where(raw >= 0, raw, slope * raw)
    e = jnp.where(blk_ref[0] != 0, e, _NEG)
    rm = jnp.max(e, axis=1)                                  # (b,)
    o_ref[...] = jnp.maximum(o_ref[...], rm[None, None, :])


@functools.partial(jax.jit, static_argnames=("block", "slope", "interpret"))
def att_rowmax(rows, cols, blocks, ssrc, sdst, block, slope,
               interpret=False):
    """Per-node max over masked tile scores: (n,) with _NEG where the node
    has no dense-tile in-edges.  ``ssrc``/``sdst``: (n,) f32."""
    n = ssrc.shape[0]
    nb = n // block
    k = rows.shape[0]
    out = pl.pallas_call(
        functools.partial(_rowmax_kernel, slope),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((1, block, block), lambda k, rows, cols:
                             (k, 0, 0)),
                pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                             (cols[k], 0, 0)),
                pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                             (rows[k], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                                   (rows[k], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, _R, block), jnp.float32),
        interpret=interpret,
    )(rows, cols, blocks, _rep8(ssrc, nb, block), _rep8(sdst, nb, block))
    return out[:, 0, :].reshape(n)


def _fwd_kernel(slope, rows_ref, cols_ref, blk_ref, ssrc_ref, sdst_ref,
                m_ref, x_ref, o_ref, den_ref):
    k = pl.program_id(0)
    row = rows_ref[k]
    prev = rows_ref[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, row != prev))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
        den_ref[...] = jnp.zeros_like(den_ref)

    pe = _pe_tile(blk_ref[0], _col(sdst_ref), _row(ssrc_ref), _col(m_ref),
                  slope)
    xb = x_ref[...]
    o_ref[...] += jnp.dot(pe.astype(xb.dtype), xb,
                          preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)
    den_ref[...] += jnp.sum(pe, axis=1)[None, None, :]


@functools.partial(jax.jit, static_argnames=("block", "slope", "interpret"))
def _att_fwd(rows, cols, blocks, ssrc, sdst, m, x, block, slope,
             interpret=False):
    n, feat = x.shape
    nb = n // block
    k = rows.shape[0]
    out, den = pl.pallas_call(
        functools.partial(_fwd_kernel, slope),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((1, block, block), lambda k, rows, cols:
                             (k, 0, 0)),
                pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                             (cols[k], 0, 0)),
                pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                             (rows[k], 0, 0)),
                pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                             (rows[k], 0, 0)),
                pl.BlockSpec((block, feat), lambda k, rows, cols:
                             (cols[k], 0)),
            ],
            out_specs=[
                pl.BlockSpec((block, feat), lambda k, rows, cols:
                             (rows[k], 0)),
                pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                             (rows[k], 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, feat), x.dtype),
            jax.ShapeDtypeStruct((nb, _R, block), jnp.float32),
        ],
        interpret=interpret,
    )(rows, cols, blocks, _rep8(ssrc, nb, block), _rep8(sdst, nb, block),
      _rep8(m, nb, block), x)
    return out, den[:, 0, :].reshape(n)


def _bwd_t_kernel(slope, trows_ref, tcols_ref, sel_ref, scale_ref, blk_ref,
                  ssrc_ref, sdst_ref, m_ref, g_ref, x_ref, dden_ref,
                  dx_ref, dssrc_ref):
    k = pl.program_id(0)
    row = trows_ref[k]
    prev = trows_ref[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, row != prev))
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)
        dssrc_ref[...] = jnp.zeros_like(dssrc_ref)

    # forward-orientation tile: fwd row block = tcols[k], col block = trows[k]
    blk = blk_ref[0]
    sdst_col = _col(sdst_ref)                   # fwd OUT rows (b, 1)
    ssrc_row = _row(ssrc_ref)                   # fwd X rows   (1, b)
    raw = sdst_col + ssrc_row
    e = jnp.where(raw >= 0, raw, slope * raw)
    mask = blk != 0
    pe = jnp.where(mask, jnp.exp(e - _col(m_ref)), 0.0)
    scale = scale_ref[k].astype(jnp.float32)

    gb = g_ref[...]                             # (b, feat) g[fwd row block]
    # dx[fwd col] += peᵀ @ g
    dx_ref[...] += (scale * jnp.dot(pe.T.astype(gb.dtype), gb,
                                    preferred_element_type=jnp.float32)
                    ).astype(dx_ref.dtype)
    # d_pe = g @ xᵀ + d_den[fwd row]  (den = Σ_j pe)
    xb = x_ref[...]                             # (b, feat) x[fwd col block]
    d_pe = jnp.dot(gb.astype(jnp.float32), xb.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32)
    d_pe = d_pe + _col(dden_ref)                # broadcast over cols
    d_raw = jnp.where(mask, d_pe * pe, 0.0)
    d_raw = jnp.where(raw >= 0, d_raw, slope * d_raw)
    dssrc_ref[...] += scale * jnp.sum(d_raw, axis=0)[None, None, :]


@functools.partial(jax.jit, static_argnames=("block", "slope", "interpret"))
def _att_bwd_t(trows, tcols, sel, scale, blocks, ssrc, sdst, m, g, x, dden,
               block, slope, interpret=False):
    n, feat = x.shape
    nb = n // block
    k = trows.shape[0]
    dx, dssrc = pl.pallas_call(
        functools.partial(_bwd_t_kernel, slope),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((1, block, block),
                             lambda k, tr, tc, sel, sc: (sel[k], 0, 0)),
                pl.BlockSpec((1, _R, block),
                             lambda k, tr, tc, sel, sc: (tr[k], 0, 0)),
                pl.BlockSpec((1, _R, block),
                             lambda k, tr, tc, sel, sc: (tc[k], 0, 0)),
                pl.BlockSpec((1, _R, block),
                             lambda k, tr, tc, sel, sc: (tc[k], 0, 0)),
                pl.BlockSpec((block, feat),
                             lambda k, tr, tc, sel, sc: (tc[k], 0)),
                pl.BlockSpec((block, feat),
                             lambda k, tr, tc, sel, sc: (tr[k], 0)),
                pl.BlockSpec((1, _R, block),
                             lambda k, tr, tc, sel, sc: (tc[k], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block, feat),
                             lambda k, tr, tc, sel, sc: (tr[k], 0)),
                pl.BlockSpec((1, _R, block),
                             lambda k, tr, tc, sel, sc: (tr[k], 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, feat), g.dtype),
            jax.ShapeDtypeStruct((nb, _R, block), jnp.float32),
        ],
        interpret=interpret,
    )(trows, tcols, sel, scale, blocks, _rep8(ssrc, nb, block),
      _rep8(sdst, nb, block), _rep8(m, nb, block), g, x,
      _rep8(dden, nb, block))
    return dx, dssrc[:, 0, :].reshape(n)


def _bwd_f_kernel(slope, rows_ref, cols_ref, blk_ref, ssrc_ref, sdst_ref,
                  m_ref, g_ref, x_ref, dden_ref, dsdst_ref):
    k = pl.program_id(0)
    row = rows_ref[k]
    prev = rows_ref[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, row != prev))
    def _():
        dsdst_ref[...] = jnp.zeros_like(dsdst_ref)

    blk = blk_ref[0]
    raw = _col(sdst_ref) + _row(ssrc_ref)
    e = jnp.where(raw >= 0, raw, slope * raw)
    mask = blk != 0
    pe = jnp.where(mask, jnp.exp(e - _col(m_ref)), 0.0)
    d_pe = jnp.dot(g_ref[...].astype(jnp.float32),
                   x_ref[...].astype(jnp.float32).T,
                   preferred_element_type=jnp.float32)
    d_pe = d_pe + _col(dden_ref)
    d_raw = jnp.where(mask, d_pe * pe, 0.0)
    d_raw = jnp.where(raw >= 0, d_raw, slope * d_raw)
    dsdst_ref[...] += jnp.sum(d_raw, axis=1)[None, None, :]


@functools.partial(jax.jit, static_argnames=("block", "slope", "interpret"))
def _att_bwd_f(rows, cols, blocks, ssrc, sdst, m, g, x, dden, block, slope,
               interpret=False):
    n, feat = x.shape
    nb = n // block
    k = rows.shape[0]
    dsdst = pl.pallas_call(
        functools.partial(_bwd_f_kernel, slope),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((1, block, block), lambda k, rows, cols:
                             (k, 0, 0)),
                pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                             (cols[k], 0, 0)),
                pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                             (rows[k], 0, 0)),
                pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                             (rows[k], 0, 0)),
                pl.BlockSpec((block, feat), lambda k, rows, cols:
                             (rows[k], 0)),
                pl.BlockSpec((block, feat), lambda k, rows, cols:
                             (cols[k], 0)),
                pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                             (rows[k], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, _R, block), lambda k, rows, cols:
                                   (rows[k], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, _R, block), jnp.float32),
        interpret=interpret,
    )(rows, cols, blocks, _rep8(ssrc, nb, block), _rep8(sdst, nb, block),
      _rep8(m, nb, block), g, x, _rep8(dden, nb, block))
    return dsdst[:, 0, :].reshape(n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def att_tiles(block, slope, rows, cols, plan, blocks, ssrc, sdst, m, x):
    """Dense-tile GAT softmax contribution: returns ``(num, den)`` where
    ``num[r] = Σ_tile pe @ x`` and ``den[r] = Σ_tile Σ_j pe``.

    ``rows``/``cols``/``plan``/``blocks``: the static tile structure
    (zero cotangents).  Differentiable in ``ssrc``, ``sdst`` (per-node
    score projections, (n,) f32) and ``x``; ``m`` (the softmax max, (n,)
    f32) is treated as a constant exactly like the segment softmax's
    ``stop_gradient`` max."""
    return _att_fwd(rows, cols, blocks, ssrc, sdst, m, x, block, slope,
                    interpret=_use_interpret())


def _att_tiles_fwd(block, slope, rows, cols, plan, blocks, ssrc, sdst, m, x):
    out = att_tiles(block, slope, rows, cols, plan, blocks, ssrc, sdst, m, x)
    return out, (rows, cols, plan, blocks, ssrc, sdst, m, x)


def _att_tiles_bwd(block, slope, res, cts):
    rows, cols, plan, blocks, ssrc, sdst, m, x = res
    g, dden = cts
    g = g.astype(x.dtype)
    dden = jnp.asarray(dden, jnp.float32)
    dx, dssrc = _att_bwd_t(plan.t_rows, plan.t_cols, plan.t_sel,
                           plan.t_scale, blocks, ssrc, sdst, m, g, x, dden,
                           block, slope, interpret=_use_interpret())
    dsdst = _att_bwd_f(rows, cols, blocks, ssrc, sdst, m, g, x, dden,
                       block, slope, interpret=_use_interpret())
    return (None, None, None, None, dssrc, dsdst, None, dx.astype(x.dtype))


att_tiles.defvjp(_att_tiles_fwd, _att_tiles_bwd)
