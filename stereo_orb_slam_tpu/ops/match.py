"""Descriptor matching: Hamming distances on the MXU + Lowe-ratio filtering.

Replaces the reference's brute-force Hamming kNN(k=2) + ratio test (ref
`src/visual_odometer.cpp:262-289` and the shared static MatchPoints at ref
`src/visual_odometer.cpp:64-91`).

TPU-first formulation: for 256-bit descriptors a and b,
    hamming(a, b) = (256 - dot(s_a, s_b)) / 2,  where s = 2*bits - 1 ∈ {-1,+1}
so the full NxM distance matrix is ONE matmul on the 128x128 systolic array
(bf16 inputs, f32 accumulation — exact, since all addends are integers well
under 2^24). This beats any VPU popcount loop by an order of magnitude and is
the core of stereo matching, temporal matching, loop-closure re-matching and
vocabulary assignment.

Matches keep the reference's one-directional semantics (no cross check): each
query row takes its best train column, gated by d1 < abs_thresh and
d1/d2 < ratio (ref `src/params.h:12,15`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from stereo_orb_slam_tpu.ops import orb

BITS = orb.N_TESTS  # 256


def signs_from_packed(desc):
    """[N,8] uint32 -> [N,256] bf16 in {-1,+1}."""
    bits = orb.unpack_bits(desc)  # {0,1} f32
    return (2.0 * bits - 1.0).astype(jnp.bfloat16)


def hamming_matrix(desc_q, desc_t, valid_q=None, valid_t=None):
    """Full Hamming distance matrix via MXU matmul.

    Args:
      desc_q: [N,8] uint32 query descriptors.
      desc_t: [M,8] uint32 train descriptors.
      valid_*: optional bool masks; invalid rows/cols get distance BITS+1.

    Returns: [N, M] float32 distances in [0, 256] (or 257 for masked).
    """
    sq = signs_from_packed(desc_q)
    st = signs_from_packed(desc_t)
    dot = jnp.dot(sq, st.T, preferred_element_type=jnp.float32)
    dist = 0.5 * (BITS - dot)
    big = jnp.float32(BITS + 1)
    if valid_q is not None:
        dist = jnp.where(valid_q[:, None], dist, big)
    if valid_t is not None:
        dist = jnp.where(valid_t[None, :], dist, big)
    return dist


def knn2(dist):
    """Per-row best and second-best: (d1, idx1, d2). [N,M] -> ([N],[N],[N])."""
    neg = -dist
    vals, idxs = jax.lax.top_k(neg, 2)
    return -vals[:, 0], idxs[:, 0], -vals[:, 1]


def _use_pallas() -> bool:
    """Fused Pallas kernel on TPU; XLA matmul + top_k elsewhere."""
    import jax

    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("use_pallas",))
def match_descriptors(
    desc_q, desc_t, valid_q, valid_t, max_distance=30.0, ratio=0.5,
    use_pallas: bool = None,
):
    """One-directional kNN(2) + Lowe ratio + absolute distance gate.

    Returns:
      idx:   [N] int32 best train index per query row.
      ok:    [N] bool — passes both gates and both rows valid.
      d1:    [N] float32 best distance.
    """
    if use_pallas is None:
        use_pallas = _use_pallas()
    n, m = desc_q.shape[0], desc_t.shape[0]
    if use_pallas and n % 128 == 0 and m % 128 == 0:
        from stereo_orb_slam_tpu.ops.pallas.hamming import hamming_top2

        d1, idx1, d2 = hamming_top2(
            signs_from_packed(desc_q), signs_from_packed(desc_t), valid_t
        )
        d1 = jnp.where(valid_q, d1, jnp.float32(BITS + 1))
    else:
        dist = hamming_matrix(desc_q, desc_t, valid_q, valid_t)
        d1, idx1, d2 = knn2(dist)
    safe_d2 = jnp.maximum(d2, 1e-6)
    ok = (
        (d1 < max_distance)
        & (d1 / safe_d2 < ratio)
        & valid_q
        & (d1 <= jnp.float32(BITS))
    )
    return idx1, ok, d1


def mutual_filter(idx_qt, ok_qt, idx_tq):
    """Optional cross-check (NOT in the reference; off by default upstream):
    keep q->t matches where t's best query is q."""
    q_ids = jnp.arange(idx_qt.shape[0], dtype=idx_qt.dtype)
    return ok_qt & (idx_tq[idx_qt] == q_ids)
