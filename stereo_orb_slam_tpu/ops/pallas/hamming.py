"""Pallas TPU kernel: fused Hamming-distance + running top-2 matching.

The XLA path (ops/match.py) computes the full [N, M] distance matrix via an
MXU matmul and then runs `top_k` over it — two HBM round-trips of the N*M
matrix. This kernel fuses them: for each 128-row query tile, it streams
128-column train tiles through the MXU and keeps only the running
(best, best-index, second-best) per query row in registers/VMEM. The [N, M]
matrix never exists, so the kernel is compute-bound on the MXU instead of
bandwidth-bound on HBM — the speed-of-light formulation for the front end's
hottest op (the O(N^2) matching stages, SURVEY.md §7 "hard parts").

Operands are the ±1 bf16 sign matrices (unpacked from the bitpacked
descriptors by the caller — a cheap VPU op): hamming = (256 - dot)/2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BITS = 256
TILE_Q = 128
TILE_T = 128
BIG = float(BITS + 1)


def _kernel(a_ref, b_ref, vt_ref, d1_ref, i1_ref, d2_ref):
    a = a_ref[:]                       # [TILE_Q, 256] bf16 signs
    m = b_ref.shape[0]
    n_tiles = m // TILE_T

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, TILE_T), 1)

    def body(t, carry):
        d1, i1, d2 = carry
        b = b_ref[pl.ds(t * TILE_T, TILE_T), :]        # [TILE_T, 256]
        dot = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [TILE_Q, TILE_T]
        dist = 0.5 * (BITS - dot)
        vt = vt_ref[0, pl.ds(t * TILE_T, TILE_T)]      # [TILE_T]
        dist = jnp.where(vt[None, :] > 0, dist, BIG)

        # Tile-local top-2 per row.
        m1 = jnp.min(dist, axis=1)                     # [TILE_Q]
        am = jnp.argmin(dist, axis=1).astype(jnp.int32)
        masked = jnp.where(col_ids == am[:, None], jnp.inf, dist)
        m2 = jnp.min(masked, axis=1)
        gidx = am + t * TILE_T

        # Merge running top-2 with tile top-2 (d1<=d2, m1<=m2).
        new_d1 = jnp.minimum(d1, m1)
        new_i1 = jnp.where(m1 < d1, gidx, i1)
        new_d2 = jnp.minimum(jnp.minimum(d2, m2), jnp.maximum(d1, m1))
        return new_d1, new_i1, new_d2

    init = (
        jnp.full((TILE_Q,), jnp.inf, jnp.float32),
        jnp.zeros((TILE_Q,), jnp.int32),
        jnp.full((TILE_Q,), jnp.inf, jnp.float32),
    )
    d1, i1, d2 = jax.lax.fori_loop(0, n_tiles, body, init)
    d1_ref[:, 0] = d1
    i1_ref[:, 0] = i1
    d2_ref[:, 0] = d2


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2(signs_q, signs_t, valid_t, interpret: bool = False):
    """Fused top-2 Hamming match.

    Args:
      signs_q: [N, 256] bf16 in {-1, +1} (query descriptors).
      signs_t: [M, 256] bf16 (train descriptors).
      valid_t: [M] bool; invalid train columns get distance BITS+1.

    Returns (d1 [N], idx1 [N], d2 [N]) float32/int32/float32. N and M must
    be multiples of 128.

    Query-row validity is NOT handled here (mask d1 outside); distances for
    all-invalid train sets come back as BITS+1.
    """
    n, k = signs_q.shape
    m = signs_t.shape[0]
    assert k == BITS and n % TILE_Q == 0 and m % TILE_T == 0, (n, m, k)

    vt = valid_t.astype(jnp.float32)[None, :]  # [1, M]

    grid = (n // TILE_Q,)
    d1, i1, d2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, BITS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, BITS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_Q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(signs_q, signs_t, vt)
    # Clamp the masked-column sentinel to BIG (inf only if M==0).
    return (
        jnp.minimum(d1[:, 0], BIG),
        i1[:, 0],
        jnp.minimum(d2[:, 0], BIG),
    )
