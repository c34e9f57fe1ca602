"""Block-sparse (BCSR) SpMM Pallas kernel for the TPU MXU.

Rationale: scalar gather/scatter fights the TPU's 8×128 tile model, but graph
adjacency reordered by community/partition (the same Leiden/coarsening
structure the reference computes for memory reasons, ``main.py:247-267``)
becomes *block*-sparse: most edges land in a small set of dense 128×128 tiles.
Each nonzero tile is then a dense MXU matmul — the "sparse GNN on dense
hardware" design.  The kernel walks the nonzero blocks of each block-row in
order, accumulating ``A_block @ X[col_block]`` into a VMEM-resident output
tile, with nonzero-block coordinates scalar-prefetched so the BlockSpec
index_maps can steer the DMA pipeline.

Differentiation: adjacency is constant in all FIT-GNN training modes, so the
VJP only needs ``dX = Aᵀ·g`` — served by the transpose BCSR structure built
alongside the forward one.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import flax.struct

BLOCK = 128  # node-block edge length: one MXU tile


@flax.struct.dataclass
class BsrMatrix:
    """Dense-block BCSR adjacency. ``blocks[k]`` is tile (rows[k], cols[k])."""

    blocks: jnp.ndarray        # (K, BLOCK, BLOCK) tile values
    rows: jnp.ndarray          # (K,) int32 block-row id, sorted ascending
    cols: jnp.ndarray          # (K,) int32 block-col id
    num_row_blocks: int = flax.struct.field(pytree_node=False)
    num_col_blocks: int = flax.struct.field(pytree_node=False)
    transpose: Optional["BsrMatrix"] = None  # for the VJP; no nested transpose
    row_splits: Optional[jnp.ndarray] = None  # (NB+1,) CSR row pointers into
                               # blocks/cols — drives the row-walk kernel
    rowwalk: bool = flax.struct.field(pytree_node=False, default=False)
    group: int = flax.struct.field(pytree_node=False, default=1)
                               # tiles per grid step (each block-row's tile
                               # run is zero-padded to a multiple of this;
                               # amortizes the per-grid-step pipeline cost)
    block: int = flax.struct.field(pytree_node=False, default=BLOCK)
                               # tile edge length (multiple of 128; larger
                               # tiles cut grid steps ~quadratically on
                               # block-diagonal-dominant adjacency at the
                               # cost of lower tile occupancy)
    einsum: bool = flax.struct.field(pytree_node=False, default=False)
                               # XLA batched-einsum path: slab-gather the
                               # column blocks, one batched MXU matmul over
                               # all tiles, sorted segment-sum over block
                               # rows.  No per-grid-step pipeline overhead
                               # (the Pallas grid costs ~2.3 µs/tile at
                               # ~1.7 tiles/block-row), so the break-even
                               # tile occupancy drops from ~48 edges to ~4
                               # at F ≤ 128 — the hybrid can absorb far
                               # more edges into tiles

    @property
    def nnz_blocks(self) -> int:
        return self.blocks.shape[0]

    @property
    def density(self) -> float:
        return self.nnz_blocks / max(self.num_row_blocks * self.num_col_blocks, 1)


def build_bsr(senders: np.ndarray, receivers: np.ndarray, weight: np.ndarray,
              num_nodes_padded: int, block: int = BLOCK,
              with_transpose: bool = True, dtype=np.float32,
              tile_dtype=None, rowwalk: bool = False,
              group: int = 1, einsum: bool = False) -> BsrMatrix:
    """Host-side BCSR construction from a COO edge list (numpy).

    ``num_nodes_padded`` must be a multiple of ``block``.  Edges pointing at
    padding slots are harmless as long as their weight is 0.
    ``tile_dtype`` (e.g. jnp.bfloat16) stores tiles at lower precision —
    halves the dominant tile HBM traffic; accumulation stays float32.
    """
    assert num_nodes_padded % block == 0
    if rowwalk and block != BLOCK:
        # the row-walk kernel's out tiles, x-slab offsets and scratch
        # shapes are built on the 128-edge MXU tile — other block sizes
        # would silently compute on wrong slabs
        raise ValueError(f"rowwalk supports block={BLOCK} only, got {block}")
    nb = num_nodes_padded // block
    brow = receivers // block
    bcol = senders // block
    key = brow.astype(np.int64) * nb + bcol
    uniq, inv = np.unique(key, return_inverse=True)
    k = uniq.shape[0]
    blocks = np.zeros((max(k, 1), block, block), dtype=dtype)
    np.add.at(blocks, (inv, receivers % block, senders % block), weight.astype(dtype))
    rows = (uniq // nb).astype(np.int32)
    cols = (uniq % nb).astype(np.int32)
    if k == 0:
        rows = np.zeros(1, dtype=np.int32)
        cols = np.zeros(1, dtype=np.int32)
    if not rowwalk and not einsum:
        # every row block needs ≥1 tile: a grid that never visits a row
        # block leaves its out tile UNINITIALIZED (out buffers are not
        # zeroed) — append zero tiles for uncovered rows, keep rows sorted.
        # (The row-walk kernel zero-inits every row itself — no fillers.)
        missing = np.setdiff1d(np.arange(nb, dtype=np.int32), rows)
        if missing.size:
            blocks = np.concatenate(
                [blocks, np.zeros((missing.size, block, block), dtype=dtype)])
            rows = np.concatenate([rows, missing])
            cols = np.concatenate([cols, np.zeros(missing.size, np.int32)])
            order = np.argsort(rows, kind="stable")
            blocks, rows, cols = blocks[order], rows[order], cols[order]
    if group > 1 and not rowwalk:
        # pad every block-row's tile run to a multiple of ``group`` with
        # zero tiles, so a grid step's tiles never straddle two out rows.
        # Padding tiles reuse the row's first real column id — a zero
        # matmul, but a coherent X-block fetch.
        counts = np.bincount(rows, minlength=nb)      # ≥1 per row (fillers)
        padded = -(-counts // group) * group
        kp = int(padded.sum())
        starts_new = np.concatenate(([0], np.cumsum(padded)))[:-1]
        starts_old = np.concatenate(([0], np.cumsum(counts)))[:-1]
        new_blocks = np.zeros((kp, block, block), dtype=dtype)
        new_rows = np.repeat(np.arange(nb, dtype=np.int32), padded)
        first_col = cols[starts_old]                  # rows is sorted
        new_cols = np.repeat(first_col, padded)
        idx = starts_new[rows] + (np.arange(rows.size) - starts_old[rows])
        new_blocks[idx] = blocks
        new_cols[idx] = cols
        blocks, rows, cols = new_blocks, new_rows, new_cols

    t = None
    if with_transpose:
        t = build_bsr(receivers, senders, weight, num_nodes_padded, block,
                      with_transpose=False, dtype=dtype,
                      tile_dtype=tile_dtype, rowwalk=rowwalk, group=group,
                      einsum=einsum)
    blocks_dev = jnp.asarray(blocks)
    if tile_dtype is not None:
        blocks_dev = blocks_dev.astype(tile_dtype)
    row_splits = jnp.asarray(
        np.searchsorted(rows, np.arange(nb + 1)).astype(np.int32))
    return BsrMatrix(
        blocks=blocks_dev, rows=jnp.asarray(rows), cols=jnp.asarray(cols),
        num_row_blocks=nb, num_col_blocks=nb, transpose=t,
        row_splits=row_splits, rowwalk=rowwalk, group=group, block=block,
        einsum=einsum)


def _kernel(rows_ref, cols_ref, a_ref, x_ref, o_ref):
    k = pl.program_id(1)
    row = rows_ref[k]
    prev_row = rows_ref[jnp.maximum(k - 1, 0)]
    is_first = jnp.logical_or(k == 0, row != prev_row)

    @pl.when(is_first)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    a = a_ref[0]
    xb = x_ref[:]
    if a.dtype == jnp.bfloat16:       # bf16 tiles: feed the MXU bf16×bf16
        xb = xb.astype(jnp.bfloat16)
    o_ref[:] += jnp.dot(a, xb,
                        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _bsr_spmm_fwd(blocks, rows, cols, x, block=BLOCK, interpret=False):
    n_pad, feat = x.shape
    k = blocks.shape[0]
    ft = min(feat, 512)
    assert feat % ft == 0, f"feature dim {feat} must divide into tiles of {ft}"
    grid = (feat // ft, k)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block, block),
                             lambda j, k, rows, cols: (k, 0, 0)),
                pl.BlockSpec((block, ft),
                             lambda j, k, rows, cols: (cols[k], j)),
            ],
            out_specs=pl.BlockSpec((block, ft),
                                   lambda j, k, rows, cols: (rows[k], j)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, feat), x.dtype),
        interpret=interpret,
    )(rows, cols, blocks, x)


def _kernel_acc(rows_ref, cols_ref, a_ref, x_ref, init_ref, o_ref):
    """Grid-walk kernel that ACCUMULATES ON TOP of ``init`` instead of
    zeros: on the first visit of an out block the kernel copies the
    matching init block in (Mosaic fetches it once per block — the index
    map changes exactly when the out block does).  Fusing the hybrid
    operator's tile+straggler add this way saves two full (N, F) HBM
    passes per SpMM (the separate tile-path output write + its re-read
    by the add fusion)."""
    k = pl.program_id(1)
    row = rows_ref[k]
    prev_row = rows_ref[jnp.maximum(k - 1, 0)]
    is_first = jnp.logical_or(k == 0, row != prev_row)

    @pl.when(is_first)
    def _():
        o_ref[:] = init_ref[:].astype(o_ref.dtype)

    a = a_ref[0]
    xb = x_ref[:]
    if a.dtype == jnp.bfloat16:
        xb = xb.astype(jnp.bfloat16)
    o_ref[:] += jnp.dot(a, xb,
                        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _bsr_spmm_fwd_acc(blocks, rows, cols, x, init, block=BLOCK,
                      interpret=False):
    n_pad, feat = x.shape
    k = blocks.shape[0]
    ft = min(feat, 512)
    assert feat % ft == 0, f"feature dim {feat} must divide into tiles of {ft}"
    grid = (feat // ft, k)
    return pl.pallas_call(
        _kernel_acc,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block, block),
                             lambda j, k, rows, cols: (k, 0, 0)),
                pl.BlockSpec((block, ft),
                             lambda j, k, rows, cols: (cols[k], j)),
                pl.BlockSpec((block, ft),
                             lambda j, k, rows, cols: (rows[k], j)),
            ],
            out_specs=pl.BlockSpec((block, ft),
                                   lambda j, k, rows, cols: (rows[k], j)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, feat), x.dtype),
        interpret=interpret,
    )(rows, cols, blocks, x, init)


def bsr_spmm_acc_raw(b: "BsrMatrix", x: jnp.ndarray,
                     init: jnp.ndarray) -> jnp.ndarray:
    """init + A·x, fused for the plain grid-walk kernel (NO custom VJP —
    callers embed this inside their own)."""
    if b.rowwalk or b.einsum or b.group > 1 or init.shape != x.shape:
        return init + _fwd_dispatch(b, x)
    return _bsr_spmm_fwd_acc(b.blocks, b.rows, b.cols, x, init,
                             block=b.block, interpret=_use_interpret())


def _make_grouped_kernel(t: int):
    """Kernel processing ``t`` same-row tiles per grid step: one (t·tile)
    A-block load + ``t`` X-block loads per step, amortizing the per-step
    pipeline/index-map overhead that dominates at ~1.7 tiles per block-row
    (PERFORMANCE.md)."""

    def kernel(rows_ref, cols_ref, a_ref, *refs):
        x_refs, o_ref = refs[:t], refs[t]
        kg = pl.program_id(1)
        row = rows_ref[kg]
        prev_row = rows_ref[jnp.maximum(kg - 1, 0)]
        is_first = jnp.logical_or(kg == 0, row != prev_row)

        @pl.when(is_first)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        acc = None
        for i in range(t):
            a = a_ref[0, i]
            xb = x_refs[i][:]
            if a.dtype == jnp.bfloat16:
                xb = xb.astype(jnp.bfloat16)
            d = jnp.dot(a, xb, preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        o_ref[:] += acc.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("group", "block",
                                                 "interpret"))
def _bsr_spmm_fwd_grouped(blocks, rows, cols, x, group, block=BLOCK,
                          interpret=False):
    n_pad, feat = x.shape
    k = blocks.shape[0]
    assert k % group == 0, "build_bsr(group=...) pads rows to the group size"
    kg = k // group
    ft = min(feat, 512)
    assert feat % ft == 0, f"feature dim {feat} must divide into tiles of {ft}"
    grid = (feat // ft, kg)
    blocks_g = blocks.reshape(kg, group, block, block)
    rows_g = rows[::group]

    def x_spec(i):
        return pl.BlockSpec(
            (block, ft),
            lambda j, g, rows, cols, i=i: (cols[g * group + i], j))

    return pl.pallas_call(
        _make_grouped_kernel(group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, group, block, block),
                             lambda j, g, rows, cols: (g, 0, 0, 0)),
            ] + [x_spec(i) for i in range(group)],
            out_specs=pl.BlockSpec((block, ft),
                                   lambda j, g, rows, cols: (rows[g], j)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, feat), x.dtype),
        interpret=interpret,
    )(rows_g, cols, blocks_g, *([x] * group))


def _rowwalk_kernel(splits_ref, cols_ref, blocks_hbm, x_hbm, o_ref,
                    a_buf, x_buf, acc, sems):
    """One grid step = one 128-row output block: walk its tiles with
    double-buffered A-tile + X-block DMAs, accumulate in f32 VMEM."""
    r = pl.program_id(0)
    lo = splits_ref[r]
    nt = splits_ref[r + 1] - lo

    def copies(j, slot):
        k = lo + j
        return (pltpu.make_async_copy(blocks_hbm.at[k], a_buf.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(cols_ref[k] * BLOCK, BLOCK), :],
                    x_buf.at[slot], sems.at[slot, 1]))

    @pl.when(nt > 0)
    def _():
        a0, x0 = copies(0, 0)
        a0.start()
        x0.start()

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nt)
        def _():
            a1, x1 = copies(j + 1, 1 - slot)
            a1.start()
            x1.start()

        aj, xj = copies(j, slot)
        aj.wait()
        xj.wait()
        acc[:] += jnp.dot(a_buf[slot], x_buf[slot],
                          preferred_element_type=jnp.float32)
        return 0

    acc[:] = jnp.zeros_like(acc)
    jax.lax.fori_loop(0, nt, body, 0)
    o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bsr_spmm_rowwalk(blocks, row_splits, cols, x, interpret=False):
    n_pad, feat = x.shape
    nb = row_splits.shape[0] - 1
    return pl.pallas_call(
        _rowwalk_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # blocks stay in HBM
                pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            ],
            out_specs=pl.BlockSpec((BLOCK, feat),
                                   lambda r, splits, cols: (r, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, BLOCK, BLOCK), blocks.dtype),
                pltpu.VMEM((2, BLOCK, feat), x.dtype),
                pltpu.VMEM((BLOCK, feat), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, feat), x.dtype),
        interpret=interpret,
    )(row_splits, cols, blocks, x)


@functools.partial(jax.jit, static_argnames=("nb", "block"))
def _bsr_spmm_einsum(blocks, rows, cols, x, nb, block=BLOCK):
    """All-XLA tile path: out[r] = Σ_k∈row r  A_k · X[col_k].

    The column-block gather moves aligned (block, F) slabs (no 8-row tiling
    amplification), the batched matmul is pure MXU food, and the scatter is
    a segment-sum over *sorted* block-row ids whose "rows" are whole
    (block·F)-element slabs — streaming-rate, not per-row-rate.  Zero filler
    tiles are harmless (rows without tiles come out zero from segment_sum).
    """
    n_pad, feat = x.shape
    xb = x.reshape(nb, block, feat)
    if blocks.dtype == jnp.bfloat16:
        xb = xb.astype(jnp.bfloat16)
    gathered = jnp.take(xb, cols, axis=0)            # (K, block, F) slabs
    # no preferred_element_type: MXU accumulates f32 internally and rounds
    # at output — matches the Pallas kernel's per-tile accumulate precision
    prod = jnp.einsum("kij,kjf->kif", blocks, gathered)
    out = jax.ops.segment_sum(prod, rows, num_segments=nb,
                              indices_are_sorted=True)
    return out.reshape(n_pad, feat).astype(x.dtype)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_dispatch(b: BsrMatrix, x: jnp.ndarray) -> jnp.ndarray:
    if b.einsum:
        return _bsr_spmm_einsum(b.blocks, b.rows, b.cols, x,
                                nb=b.num_row_blocks, block=b.block)
    if b.rowwalk:
        return _bsr_spmm_rowwalk(b.blocks, b.row_splits, b.cols, x,
                                 interpret=_use_interpret())
    if b.group > 1:
        return _bsr_spmm_fwd_grouped(b.blocks, b.rows, b.cols, x, b.group,
                                     block=b.block,
                                     interpret=_use_interpret())
    return _bsr_spmm_fwd(b.blocks, b.rows, b.cols, x, block=b.block,
                         interpret=_use_interpret())


@jax.custom_vjp
def bsr_spmm(bsr: BsrMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """out = A·x with A in BCSR form. (N_pad, F) → (N_pad, F)."""
    return _fwd_dispatch(bsr, x)


def _fwd(bsr, x):
    return bsr_spmm(bsr, x), bsr


def _bwd(bsr, g):
    assert bsr.transpose is not None, "build_bsr(with_transpose=True) required for grad"
    t = bsr.transpose
    dx = _fwd_dispatch(t.replace(rowwalk=bsr.rowwalk, einsum=bsr.einsum), g)
    return None, dx


bsr_spmm.defvjp(_fwd, _bwd)
