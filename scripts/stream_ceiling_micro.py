"""What HBM bandwidth is actually achievable on this chip, measured three
ways: XLA copy, XLA copy at bf16, and a Pallas block-copy kernel (grid
over row blocks, Mosaic's automatic double-buffered DMA pipeline).

The nominal v5e roofline is 819 GB/s; kernel GB/s numbers in
PERFORMANCE.md are meaningful relative to the ceiling THIS stack reaches
on a pure stream, not the datasheet number.  Traffic accounting: read +
write bytes.

Protocol: REPS chained iterations inside one jitted fori_loop (sub-ms ops
cannot be dispatch-timed through the tunnel), final scalar fetch.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# REPS must swamp the ~40 ms fixed one-dispatch tunnel latency: at 16 reps
# that latency alone reads as ~2.5 ms/op ("213 GB/s ceiling" — wrong); a
# 0.8 ms copy needs hundreds of reps for <5 % bias.
REPS = int(__import__("os").environ.get("CEIL_REPS", "256"))
N, F = 131072, 512


def timed(fn, x, *rest):
    # extra operands are ARGUMENTS, not closure constants — a closed-over
    # array is baked into the program and blows the tunnel's compile
    # request limit (HTTP 413) at these sizes
    @jax.jit
    def loop(x_, *r):
        return jax.lax.fori_loop(0, REPS, lambda i, v: fn(v, *r), x_)

    out = loop(x, *rest)
    _ = float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    out = loop(out, *rest)
    _ = float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / REPS


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 1.0000001  # not a no-op XLA could elide


def pallas_copy(x, rows_per_block):
    n, f = x.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(n // rows_per_block,),
        in_specs=[pl.BlockSpec((rows_per_block, f), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows_per_block, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, f), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x)


def main():
    rng = np.random.default_rng(0)
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(rng.standard_normal((N, F)), dtype=dtype)
        nbytes = 2 * N * F * x.dtype.itemsize          # read + write
        # roll: pure data movement XLA cannot elide at ANY dtype (the old
        # ``v * 1.0000001`` rounds to a no-op multiply in bf16 and the
        # whole chain gets deleted — "2173 GB/s")
        per = timed(lambda v: jnp.roll(v, 1, axis=0), x)
        print(f"XLA copy {name}: {per*1e3:.2f} ms  {nbytes/per/1e9:.0f} GB/s")
        # two-operand add: the shape of the hot elementwise fusions in the
        # training step (device traces show add fusions moving 3 arrays at
        # ~675 GB/s, far above what the 1-operand loop above reports — the
        # dependent-chain loop serializes on one buffer)
        y = jnp.asarray(rng.standard_normal((N, F)), dtype=dtype)
        per = timed(lambda v, yy: (v + yy) * 0.9999999, x, y)
        print(f"XLA add2 {name}: {per*1e3:.2f} ms  "
              f"{3*N*F*x.dtype.itemsize/per/1e9:.0f} GB/s (3-array)")
        for rpb in (256, 512, 1024):   # 4096 f32 blocks blow the 16 MB
                                       # scoped-VMEM limit (2 buffers ×
                                       # double-buffering × 8 MB)
            per = timed(lambda v, r=rpb: pallas_copy(v, r), x)
            print(f"pallas copy {name} rows/block={rpb}: {per*1e3:.2f} ms  "
                  f"{nbytes/per/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
