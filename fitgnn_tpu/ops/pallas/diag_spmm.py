"""Block-DIAGONAL SpMM Pallas kernel: R diagonal blocks per grid step.

Community-reordered graphs put ~90 % of their dense-tile edges on the block
DIAGONAL (reference's Leiden structure, ``main.py:247-267``), where the
column block equals the row block — so a run of R consecutive diagonal
blocks reads ONE contiguous (R·b, F) X slab and writes ONE contiguous
(R·b, F) out slab.  No scalar prefetch, no per-tile index maps: the whole
grid step is three contiguous DMAs + R small MXU matmuls.

Why this beats the batched XLA einsum (the previous diagonal path): the
measured per-matmul-op floor on this stack is ~1.1-1.7 µs through BOTH the
XLA batched dot and the Pallas per-tile grid, while *marginal* bytes inside
a grid step stream at ~600 GB/s (round-3 roofline sweep, PERFORMANCE.md).
Batching R=8-16 blocks per step amortizes the fixed cost 8-16× with zero
padding waste — the diagonal's contiguity is what makes the grouping free,
unlike the off-diagonal grouped kernel whose row-run padding cancels the
amortization.

Differentiation: adjacency is constant (all FIT-GNN modes), so the VJP is
``dX = diag(Aᵀ)·g`` — the same kernel with each block transposed in-VMEM
(a ``dot_general`` contracting the other axis; no transposed copy in HBM).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _make_kernel(r: int, block: int, transpose: bool, with_init: bool):
    def kernel(*refs):
        if with_init:
            a_ref, x_ref, init_ref, o_ref = refs
        else:
            a_ref, x_ref, o_ref = refs
        for i in range(r):
            a = a_ref[i]
            xb = x_ref[i * block:(i + 1) * block, :]
            if a.dtype == jnp.bfloat16:
                xb = xb.astype(jnp.bfloat16)
            if transpose:
                # Aᵀ·x without materializing the transpose: contract the
                # row axis of the stored block
                d = jax.lax.dot_general(
                    a, xb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                d = jnp.dot(a, xb, preferred_element_type=jnp.float32)
            if with_init:
                d = d + init_ref[i * block:(i + 1) * block, :].astype(
                    jnp.float32)
            o_ref[i * block:(i + 1) * block, :] = d.astype(o_ref.dtype)
    return kernel


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("r", "transpose", "interpret"))
def _diag_spmm(blocks, x, r: int, transpose: bool = False,
               interpret: bool = False):
    nb, b, _ = blocks.shape
    n_pad, feat = x.shape
    assert n_pad == nb * b, (n_pad, nb, b)
    assert nb % r == 0, f"pad diag blocks to a multiple of r={r} (nb={nb})"
    grid = (nb // r,)
    return pl.pallas_call(
        _make_kernel(r, b, transpose, with_init=False),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, b, b), lambda g: (g, 0, 0)),
            pl.BlockSpec((r * b, feat), lambda g: (g, 0)),
        ],
        out_specs=pl.BlockSpec((r * b, feat), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, feat), x.dtype),
        interpret=interpret,
    )(blocks, x)


@functools.partial(jax.jit, static_argnames=("r", "transpose", "interpret"))
def _diag_spmm_acc(blocks, x, init, r: int, transpose: bool = False,
                   interpret: bool = False):
    """init + diag(A)·x with the add fused into the kernel's out write —
    the diagonal analog of ``bsr_spmm_acc_raw`` (saves one full (N, F)
    read+write pass vs a separate XLA add)."""
    nb, b, _ = blocks.shape
    n_pad, feat = x.shape
    assert n_pad == nb * b and nb % r == 0
    grid = (nb // r,)
    return pl.pallas_call(
        _make_kernel(r, b, transpose, with_init=True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, b, b), lambda g: (g, 0, 0)),
            pl.BlockSpec((r * b, feat), lambda g: (g, 0)),
            pl.BlockSpec((r * b, feat), lambda g: (g, 0)),
        ],
        out_specs=pl.BlockSpec((r * b, feat), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, feat), x.dtype),
        interpret=interpret,
    )(blocks, x, init)


def pick_run_length(nb: int, max_r: int = 8) -> int:
    """Largest r ≤ max_r dividing nb (diag blocks per grid step)."""
    for r in range(min(max_r, nb), 0, -1):
        if nb % r == 0:
            return r
    return 1


def diag_spmm_raw(blocks: jnp.ndarray, x: jnp.ndarray, r: int,
                  transpose: bool = False,
                  init: jnp.ndarray | None = None) -> jnp.ndarray:
    """(init +) diag(A)·x — NO custom VJP; callers embed it in their own
    (the hybrid operator differentiates via its transpose structures)."""
    if init is None:
        return _diag_spmm(blocks, x, r, transpose=transpose,
                          interpret=_use_interpret())
    return _diag_spmm_acc(blocks, x, init, r, transpose=transpose,
                          interpret=_use_interpret())


def diag_oracle(blocks: np.ndarray, x: np.ndarray,
                transpose: bool = False) -> np.ndarray:
    """Dense einsum oracle for tests."""
    nb, b, _ = blocks.shape
    xb = x.reshape(nb, b, -1)
    eq = "bji,bjf->bif" if transpose else "bij,bjf->bif"
    return np.einsum(eq, np.asarray(blocks, np.float32),
                     np.asarray(xb, np.float32)).reshape(x.shape)
