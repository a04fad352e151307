"""Pallas TPU kernels for the matching hot path.

``hamming_top2``: fused binary-descriptor matcher. The XLA path
(ops/matching.py) materializes the full (K1, K2) distance matrix in HBM and
re-reads it for top-k and cross-check; this kernel streams K2 in VMEM tiles,
computing the distance block on the MXU (popcnt identity: |a|+|b|-2ab) and
reducing it immediately to per-query (best, second-best, argbest) plus the
per-train column minimum needed for cross-checking — one pass, no (K1, K2)
HBM traffic.

Grid: sequential over K1 row-tiles (TPU grids iterate in order, so the
column-minimum output can be accumulated across steps with a first-step
init). Inside each step a fori_loop walks K2 tiles.

Tested in interpreter mode on CPU against the XLA reference (exact
agreement) and verified compiling + matching on a real v5e.

Status: the XLA matmul path (ops/matching.py) remains the production
default — at K=2000 the (K,K) matrix is only 16 MB and XLA's fused
matmul+top-k pipeline measured ~2 ms vs ~36 ms for this kernel through the
axon relay (single-block VMEM residency + a serial fori_loop leave MXU
utilization on the table). Kept as the scaling path for descriptor counts
where the KxK materialization stops fitting, and as the in-repo Pallas
reference pattern.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _hamming_top2_kernel(
    b1_ref,  # (TILE1, 256) bf16 query bits
    pop1_ref,  # (TILE1, 1) f32
    v1_ref,  # (TILE1, 1) f32 query validity
    b2t_ref,  # (256, K2) bf16 train bits, TRANSPOSED (Mosaic wants (M,K)@(K,N))
    pop2_ref,  # (K2, 1) f32
    v2_ref,  # (K2, 1) f32
    best_ref,  # out (TILE1, 1) f32
    second_ref,  # out (TILE1, 1) f32
    idx_ref,  # out (TILE1, 1) i32
    colmin_ref,  # out (K2, 1) f32 — accumulated across the grid
    colarg_ref,  # out (K2, 1) i32 — row achieving the column min
    *,
    tile2: int,
):
    i = pl.program_id(0)
    T1 = b1_ref.shape[0]
    K2 = b2t_ref.shape[1]

    @pl.when(i == 0)
    def _():
        colmin_ref[:] = jnp.full((K2, 1), BIG, jnp.float32)
        colarg_ref[:] = jnp.zeros((K2, 1), jnp.int32)

    b1 = b1_ref[:]
    pop1 = pop1_ref[:, 0]
    v1 = v1_ref[:, 0]
    n_tiles = K2 // tile2

    def body(t, carry):
        best, second, bidx = carry
        off = t * tile2
        b2t = b2t_ref[:, pl.ds(off, tile2)]
        pop2 = pop2_ref[pl.ds(off, tile2), 0]
        v2 = v2_ref[pl.ds(off, tile2), 0]
        dots = jax.lax.dot_general(
            b1, b2t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # Explicit DEFAULT: the package-wide HIGHEST default would ask
            # Mosaic for an fp32-contract on bf16 operands ("Bad lhs type");
            # bf16 x bf16 -> f32-accumulate is exact for 0/1 bit vectors.
            precision=jax.lax.Precision.DEFAULT,
        )  # (T1, tile2)
        d = pop1[:, None] + pop2[None, :] - 2.0 * dots
        valid = (v1[:, None] > 0) & (v2[None, :] > 0)
        d = jnp.where(valid, d, BIG)

        # Row-wise tile top-2.
        t_best = jnp.min(d, axis=1)
        t_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + off
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + off
        d2 = jnp.where(cols == t_arg[:, None], BIG, d)
        t_second = jnp.min(d2, axis=1)

        # Merge with running top-2.
        new_best = jnp.minimum(best, t_best)
        new_bidx = jnp.where(t_best < best, t_arg, bidx)
        # True second of the union {best, second, t_best, t_second}, given
        # second >= best and t_second >= t_best.
        new_second = jnp.minimum(jnp.maximum(best, t_best), jnp.minimum(second, t_second))

        # Column minima for cross-check.
        c_min = jnp.min(d, axis=0)
        c_arg = jnp.argmin(d, axis=0).astype(jnp.int32) + i * T1
        prev = colmin_ref[pl.ds(off, tile2), 0]
        take = c_min < prev
        colmin_ref[pl.ds(off, tile2), 0] = jnp.where(take, c_min, prev)
        prev_arg = colarg_ref[pl.ds(off, tile2), 0]
        colarg_ref[pl.ds(off, tile2), 0] = jnp.where(take, c_arg, prev_arg)
        return new_best, new_second, new_bidx

    init = (
        jnp.full((T1,), BIG, jnp.float32),
        jnp.full((T1,), BIG, jnp.float32),
        jnp.zeros((T1,), jnp.int32),
    )
    best, second, bidx = jax.lax.fori_loop(0, n_tiles, body, init)
    best_ref[:, 0] = best
    second_ref[:, 0] = second
    idx_ref[:, 0] = bidx


@partial(jax.jit, static_argnames=("tile1", "tile2", "interpret"))
def hamming_top2(
    bits1: jnp.ndarray,  # (K1, 256) bf16/f32 unpacked bits
    pop1: jnp.ndarray,  # (K1,)
    valid1: jnp.ndarray,  # (K1,) bool
    bits2: jnp.ndarray,
    pop2: jnp.ndarray,
    valid2: jnp.ndarray,
    tile1: int = 256,
    tile2: int = 512,
    interpret: bool = False,
):
    """Returns (best (K1,), second (K1,), best_idx (K1,) int32,
    col_argmin (K2,) int32 — the query row winning each train column)."""
    K1 = bits1.shape[0]
    K2 = bits2.shape[0]
    # Pad to tile multiples (padded slots are invalid -> distance BIG).
    K1p = -(-K1 // tile1) * tile1
    K2p = -(-K2 // tile2) * tile2
    b1 = jnp.zeros((K1p, bits1.shape[1]), bits1.dtype).at[:K1].set(bits1)
    b2t = jnp.zeros((bits2.shape[1], K2p), bits2.dtype).at[:, :K2].set(bits2.T)
    p1 = jnp.zeros((K1p, 1), jnp.float32).at[:K1, 0].set(pop1.astype(jnp.float32))
    p2 = jnp.zeros((K2p, 1), jnp.float32).at[:K2, 0].set(pop2.astype(jnp.float32))
    v1 = jnp.zeros((K1p, 1), jnp.float32).at[:K1, 0].set(valid1.astype(jnp.float32))
    v2 = jnp.zeros((K2p, 1), jnp.float32).at[:K2, 0].set(valid2.astype(jnp.float32))

    grid = (K1p // tile1,)
    out = pl.pallas_call(
        partial(_hamming_top2_kernel, tile2=tile2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile1, bits1.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile1, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile1, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bits1.shape[1], K2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2p, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2p, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile1, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile1, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile1, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2p, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2p, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((K1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((K1p, 1), jnp.int32),
            jax.ShapeDtypeStruct((K2p, 1), jnp.float32),
            jax.ShapeDtypeStruct((K2p, 1), jnp.int32),
        ],
        interpret=interpret,
    )(b1, p1, v1, b2t, p2, v2)
    best, second, bidx, colmin, colarg = out
    return (
        best[:K1, 0],
        second[:K1, 0],
        bidx[:K1, 0],
        colarg[:K2, 0],
    )


def match_nn_pallas(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.75,
    cross_check: bool = True,
    max_distance: float = 0.0,
    interpret: bool = False,
):
    """Drop-in analogue of matching.match_nn fed by packed uint32
    descriptors; returns (train_idx, distance, valid)."""
    from .orb import unpack_bits

    b1 = unpack_bits(desc1)
    b2 = unpack_bits(desc2)
    pop1 = jnp.sum(b1.astype(jnp.float32), axis=-1)
    pop2 = jnp.sum(b2.astype(jnp.float32), axis=-1)
    best, second, bidx, colarg = hamming_top2(
        b1, pop1, valid1, b2, pop2, valid2, interpret=interpret
    )
    ok = best < BIG * 0.5
    if ratio > 0:
        ok &= best < ratio * second
    if cross_check:
        ok &= colarg[bidx] == jnp.arange(desc1.shape[0])
    if max_distance > 0:
        ok &= best <= max_distance
    return bidx, best, ok
