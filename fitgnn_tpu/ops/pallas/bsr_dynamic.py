"""Dynamic-block BSR apply: ``out[rows[k]] += B[k] @ x[cols[k]]`` where the
tile VALUES are a traced array (not build-time constants).

The static-weight BSR kernel (``bsr_spmm.py``) bakes the adjacency into the
structure and only differentiates through ``x``.  GAT's tile-dense attention
needs the same VMEM-accumulating MXU walk but with per-step tile values
``pe = exp(e − m)·mask`` that depend on the current scores — and gradients
w.r.t. those values.  This module reuses the forward kernel shape and adds:

* a transpose PLAN (built host-side): for each transpose slot, the index of
  the forward tile to read (``t_sel``), a 0/1 validity scale for coverage
  fillers (``t_scale``), and the out/x block ids — so ``dx = Σ B[k]ᵀ g`` runs
  as the same kernel with in-kernel tile transpose, no re-sorted tile copy;
* ``dB[k] = g[rows[k]] @ x[cols[k]]ᵀ`` as one batched MXU einsum over
  coherent slab gathers.

Replaces the XLA einsum + slab segment-sum pair in ``ops/tile_gat.py``
(reference GAT hot loop, ``network.py:13``; the slab segment-sum lowers to
~3 µs/tile scalar scatter — PERFORMANCE.md round-2 notes).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import flax.struct


@flax.struct.dataclass
class DynPlan:
    """Static transpose-order plan for a dynamic-block tile set."""

    t_sel: jnp.ndarray    # (Kt,) int32 forward-tile index per transpose slot
    t_scale: jnp.ndarray  # (Kt,) int32 1 = real tile, 0 = coverage filler
    t_rows: jnp.ndarray   # (Kt,) int32 out block id, sorted ascending
    t_cols: jnp.ndarray   # (Kt,) int32 x block id


def build_dyn_plan(rows: np.ndarray, cols: np.ndarray, nb: int) -> DynPlan:
    """Host-side: transpose tile order (sorted by the transpose's out block
    = forward ``cols``), with zero-scale fillers so every out block is
    visited (unvisited out tiles are UNINITIALIZED, not zero)."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    order = np.argsort(cols, kind="stable")
    t_rows, t_cols, t_sel = cols[order], rows[order], order
    t_scale = np.ones(len(order), dtype=np.int64)
    missing = np.setdiff1d(np.arange(nb, dtype=np.int64), t_rows)
    if missing.size:
        t_rows = np.concatenate([t_rows, missing])
        t_cols = np.concatenate([t_cols, np.zeros(missing.size, np.int64)])
        t_sel = np.concatenate([t_sel, np.zeros(missing.size, np.int64)])
        t_scale = np.concatenate([t_scale, np.zeros(missing.size, np.int64)])
        res = np.argsort(t_rows, kind="stable")
        t_rows, t_cols = t_rows[res], t_cols[res]
        t_sel, t_scale = t_sel[res], t_scale[res]
    return DynPlan(t_sel=jnp.asarray(t_sel, dtype=jnp.int32),
                   t_scale=jnp.asarray(t_scale, dtype=jnp.int32),
                   t_rows=jnp.asarray(t_rows, dtype=jnp.int32),
                   t_cols=jnp.asarray(t_cols, dtype=jnp.int32))


def _make_dyn_kernel(trans: bool):
    def kernel(rows_ref, sel_ref, scale_ref, cols_ref, a_ref, x_ref, o_ref):
        k = pl.program_id(1)
        row = rows_ref[k]
        prev = rows_ref[jnp.maximum(k - 1, 0)]

        @pl.when(jnp.logical_or(k == 0, row != prev))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        a = a_ref[0]
        if trans:
            a = a.T
        xb = x_ref[:]
        if a.dtype == jnp.bfloat16:
            xb = xb.astype(jnp.bfloat16)
        d = jnp.dot(a, xb, preferred_element_type=jnp.float32)
        d = d * scale_ref[k].astype(jnp.float32)
        o_ref[:] += d.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "trans", "interpret"))
def _dyn_apply(blocks, rows, sel, scale, cols, x, block, trans=False,
               interpret=False):
    """out[rows[k]] += scale[k] · (blocks[sel[k]](ᵀ) @ x[cols[k]])."""
    n_pad, feat = x.shape
    k = rows.shape[0]
    ft = min(feat, 512)
    assert feat % ft == 0, f"feature dim {feat} must divide into tiles of {ft}"
    grid = (feat // ft, k)
    return pl.pallas_call(
        _make_dyn_kernel(trans),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block, block),
                             lambda j, k, rows, sel, scale, cols:
                             (sel[k], 0, 0)),
                pl.BlockSpec((block, ft),
                             lambda j, k, rows, sel, scale, cols:
                             (cols[k], j)),
            ],
            out_specs=pl.BlockSpec((block, ft),
                                   lambda j, k, rows, sel, scale, cols:
                                   (rows[k], j)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, feat), x.dtype),
        interpret=interpret,
    )(rows, sel, scale, cols, blocks, x)


def _dB_kernel(rows_ref, cols_ref, g_ref, x_ref, o_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    gb = g_ref[:]
    xb = x_ref[:]
    if o_ref.dtype == jnp.bfloat16:
        gb = gb.astype(jnp.bfloat16)
        xb = xb.astype(jnp.bfloat16)
    # dB[k] += g_blk @ x_blkᵀ: contract on the feature axis (NT matmul —
    # no materialized transpose)
    d = jax.lax.dot_general(gb, xb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] += d.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "out_dtype",
                                              "interpret"))
def _dyn_grad_blocks(rows, cols, g, x, block, out_dtype=None,
                     interpret=False):
    """dB[k] = g[rows[k]] @ x[cols[k]]ᵀ as a Pallas grid over tiles: the
    g/x BLOCKS stream straight from HBM (Mosaic skips re-fetches while the
    block index repeats across a same-row tile run) instead of
    materializing two (K, block, F) slab gathers that the batched einsum
    then re-reads (~750 MB of intermediate traffic per backward at bench
    scale — device trace fusion.405/406)."""
    k = rows.shape[0]
    feat = x.shape[-1]
    ft = min(feat, 512)
    assert feat % ft == 0
    grid = (k, feat // ft)      # j innermost: accumulate F chunks per tile
    return pl.pallas_call(
        _dB_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block, ft),
                             lambda k, j, rows, cols: (rows[k], j)),
                pl.BlockSpec((block, ft),
                             lambda k, j, rows, cols: (cols[k], j)),
            ],
            out_specs=pl.BlockSpec((1, block, block),
                                   lambda k, j, rows, cols: (k, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((k, block, block),
                                       out_dtype or g.dtype),
        interpret=interpret,
    )(rows, cols, g, x)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.custom_vjp
def bsr_spmm_dyn(rows: jnp.ndarray, cols: jnp.ndarray, plan: DynPlan,
                 blocks_dyn: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Σ_k scatter(rows[k], blocks_dyn[k] @ x[cols[k]]), differentiable in
    ``blocks_dyn`` AND ``x``.  ``rows`` must be sorted ascending and cover
    every out block (the static BSR builder's coverage fillers guarantee
    this; filler tiles must carry zero dynamic values)."""
    k, b, _ = blocks_dyn.shape
    ident = jnp.arange(k, dtype=jnp.int32)
    ones = jnp.ones((k,), dtype=jnp.int32)
    return _dyn_apply(blocks_dyn, rows, ident, ones, cols, x, b,
                      trans=False, interpret=_use_interpret())


def _bsr_dyn_fwd(rows, cols, plan, blocks_dyn, x):
    return bsr_spmm_dyn(rows, cols, plan, blocks_dyn, x), (
        rows, cols, plan, blocks_dyn, x)


def _bsr_dyn_bwd(res, g):
    rows, cols, plan, blocks_dyn, x = res
    _, b, _ = blocks_dyn.shape
    dx = _dyn_apply(blocks_dyn, plan.t_rows, plan.t_sel, plan.t_scale,
                    plan.t_cols, g, b, trans=True,
                    interpret=_use_interpret())
    dblocks = _dyn_grad_blocks(rows, cols, g, x, b,
                               out_dtype=blocks_dyn.dtype,
                               interpret=_use_interpret())
    return None, None, None, dblocks, dx


bsr_spmm_dyn.defvjp(_bsr_dyn_fwd, _bsr_dyn_bwd)
