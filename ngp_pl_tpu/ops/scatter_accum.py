"""Accumulating row-scatter kernels — the hash-table gradient reduction.

The encoder backward must reduce ~P (pool-size) per-sample gradient rows
into the per-level brick table: `d_table[idx[p]] += d_rows[p]`.  XLA's
scatter-add costs ~7.6 ns per input row on this chip regardless of target
size or duplicate structure (benchmarking/micro_scatter.py, PERF.md) —
~12-15 ms/step at honest demand, the single largest step component.

Two TPU-native alternatives (SURVEY §7 hard-part #1; attempts mandated by
VERDICT r4 #3):

1. `scatter_onehot` — MXU formulation for SMALL levels: the reduction is
   the matmul  onehot(idx)^T @ d_rows  with a (BP, R) 0/1 matrix built
   in-kernel by comparing idx against an iota.  Work R*P*W MACs: only
   viable where R (level rows) is small — the dense coarse levels
   (R = 512, 2744 for the flagship L8F4 geometry).

2. `scatter_accum` — sequential VMEM accumulator for ANY level that fits
   VMEM (all flagship levels: R <= 16384 rows x 512 B = 8.4 MB): the TPU
   Pallas grid executes SEQUENTIALLY on one core, so a persistent scratch
   accumulator + per-sample read-modify-write has no write hazards — the
   atomics the CUDA reference leans on (tinycudann's scatter-add) become
   a plain serial loop.  Throughput is bound by the per-iteration cost of
   a (1, W) dynamic RMW (measured on-chip; see PERF.md r5).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("n_rows", "block"))
def scatter_accum(d_rows: jnp.ndarray, row_idx: jnp.ndarray, *,
                  n_rows: int, block: int = 1024) -> jnp.ndarray:
    """out[r] = sum_p d_rows[p] * (row_idx[p] == r), via a sequential VMEM
    accumulator.  d_rows: (P, W) f32; row_idx: (P,) int32 in [0, n_rows).
    n_rows must be a multiple of 8 (native f32 sublane tile)."""
    P, W = d_rows.shape
    R = n_rows
    assert R % 8 == 0
    pad = (-P) % block
    if pad:
        # padded d_rows are ZERO, so clamping their index to R-1 in-kernel
        # adds nothing — no dump row / masking needed
        d_rows = jnp.pad(d_rows, ((0, pad), (0, 0)))
        row_idx = jnp.pad(row_idx, (0, pad), constant_values=R - 1)
    # SMEM blocks are lane-padded to 128, so a (block, 1) layout would
    # burn block*128 words; pack indices 128-per-row instead
    idx2 = jnp.clip(row_idx.astype(jnp.int32), 0, R - 1).reshape(-1, 128)
    n_blocks = (P + pad) // block
    rows_per_blk = block // 128

    def kernel(idx_ref, d_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(j, _):
            r = idx_ref[j // 128, j % 128]
            out_ref[pl.ds(r, 1), :] += d_ref[pl.ds(j, 1), :]
            return 0

        jax.lax.fori_loop(0, block, body, 0)   # Mosaic: unroll 1 or full

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rows_per_blk, 128), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
    )(idx2, d_rows)


@functools.partial(jax.jit, static_argnames=("n_rows", "block", "exact"))
def scatter_onehot(d_rows: jnp.ndarray, row_idx: jnp.ndarray, *,
                   n_rows: int, block: int = 1024,
                   exact: bool = True) -> jnp.ndarray:
    """MXU one-hot reduction: out = onehot(idx)^T @ d_rows, accumulated in
    f32 across sample blocks.  Viable for small n_rows (dense coarse
    levels).  exact=True keeps d_rows f32 through the MXU (1/4 bf16 rate
    but bit-exact products); False casts to bf16 (rounds each gradient
    contribution to 8 mantissa bits)."""
    P, W = d_rows.shape
    R = n_rows
    assert R % 8 == 0
    pad = (-P) % block
    if pad:
        d_rows = jnp.pad(d_rows, ((0, pad), (0, 0)))
        row_idx = jnp.pad(row_idx, (0, pad), constant_values=R)
    idx2 = row_idx.astype(jnp.int32).reshape(-1, 1)
    n_blocks = (P + pad) // block
    dt = jnp.float32 if exact else jnp.bfloat16

    def kernel(idx_ref, d_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rows = jax.lax.broadcasted_iota(jnp.int32, (block, R), 1)
        onehot = (idx_ref[:] == rows).astype(dt)            # (BP, R)
        out_ref[:] += jax.lax.dot_general(
            onehot, d_ref[:].astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())),      # (R, W)
            preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
    )(idx2, d_rows)
