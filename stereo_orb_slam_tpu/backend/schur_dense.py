"""Explicit (dense) reduced-camera-system assembly for windowed BA.

Same math as the matrix-free path in backend/ba.py (LM over the reference's
stereo reprojection cost, ref `src/bundle_adjuster.cpp:39-133`); only the
Schur solve differs. The matrix-free path pays two segment-sum scatters +
two gathers over all observations PER CG ITERATION — measured ~2.4 ms per
iteration on v5e at O=131k, ~60% of the LM step. Here the reduced camera
system

    S = H_cc_l - W H_pp_l^-1 W^T        (6C x 6C)

is MATERIALIZED once per LM step as a sum of pure MXU matmuls, and PCG then
runs on the explicit S: one [6C,6C] matvec per iteration (~6 us measured),
so the CG budget is effectively free and runs to a tight tolerance.

Layout contract: the BundleAdjuster sorts observations BY POINT on the
host, so each point's observations form a contiguous run. `group_slots`
then emits MONOTONIC [P, K] slot->observation index maps (clamped run
indices + validity mask), which makes the one big W gather
`indices_are_sorted` (single sweep) and turns every point-side reduction
into a gather + local sum over the K slot axis — no scatter anywhere.

Assembly: per point chunk, the slot W blocks are expanded into a dense
A = [3*Pc, 6C] via a one-hot matmul (slot camera id -> camera column
block), and  S -= A^T (blockdiag(Hpp_inv) A)  accumulates over chunks as a
single well-shaped [6C,3Pc]x[3Pc,6C] matmul — the contraction the MXU is
built for. Memory peaks at O(P*K) + O((6C)^2), so this path is gated to
windowed problems (C <= BAConfig.dense_schur_max_cams, P*K <=
dense_schur_max_slots); global BA over thousands of keyframes and the
distributed shard_map path keep the matrix-free formulation
(backend/ba.py, parallel/dist_ba.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


SUPER_ROWS = 8  # retained for compatibility; maps are plain run maps


def slot_width(K: int, R: int = SUPER_ROWS) -> int:
    """Slot-map width for a raw max-obs-per-point bucket K. The r4
    super-row experiment widened maps to R-aligned windows; that layout
    REGRESSED on hardware (see slot_gather docstring), so the width is
    simply K again."""
    return K


def group_slots(obs_point, obs_cam, n_points_pad: int, n_obs: int):
    """Host-side slot maps for dense-Schur assembly.

    REQUIRES obs_point sorted ascending (the BundleAdjuster's layout).
    Returns (slot_to_obs [P,K] int32 — monotonic, clamped into each point's
    run; slot_cam [P,K] int32; slot_mask [P,K] float32; K) with K the max
    observations per point rounded up to a power of two (min 2).
    """
    obs_point = np.asarray(obs_point)
    obs_cam = np.asarray(obs_cam)
    assert np.all(np.diff(obs_point) >= 0), "observations must be point-sorted"
    counts = np.bincount(obs_point, minlength=n_points_pad)[:n_points_pad]
    kmax = max(int(counts.max(initial=0)), 2)
    K = 1 << (kmax - 1).bit_length()

    starts = np.zeros(n_points_pad, np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    k = np.arange(K)
    # Clamp within each run (keeps the raster order monotonic; padding slots
    # re-read the run's last row and are zeroed by slot_mask).
    sto = starts[:, None] + np.minimum(k[None, :],
                                       np.maximum(counts - 1, 0)[:, None])
    sto = np.minimum(sto, max(n_obs - 1, 0)).astype(np.int32)
    mask = (k[None, :] < counts[:, None]).astype(np.float32)
    scam = np.where(mask > 0, obs_cam[sto] if n_obs else 0, 0).astype(np.int32)
    return sto, scam, mask, K


def slot_gather(x, slot_to_obs, slot_mask, sorted_indices: bool = True):
    """x [O, F] -> [P, K, F] via the slot map.

    `sorted_indices=True` is the point-grouped map contract (monotonic in
    raster order — single-sweep gather); the camera-run maps built on
    device by ba.build_cam_slots_device jump between runs of the
    point-sorted obs array, so they pass False.

    MEASURED DEAD ENDS on v5e (r4 op-level traces) — do not retry blindly:
    (1) one contiguous (K, F) slice gather per point lowers to SERIAL
    dynamic-slices (13.3 -> 31 ms/LM-iteration); (2) R=8 super-row maps
    ([O/R, R*F] reshape + wider masked windows) push the cost into a
    layout-change reshape copy, an operand pad, and a [P,K2,F] mask
    broadcast (also ~31 ms/iter). The plain row gather keeps the whole
    iteration at ~13 ms with no single dominant op."""
    P, K = slot_to_obs.shape
    F = x.shape[-1]
    out = lax.gather(
        x, slot_to_obs[..., None],
        lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(0,),
            start_index_map=(0,),
        ),
        slice_sizes=(1, F), indices_are_sorted=sorted_indices,
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return out * slot_mask[..., None]


def _chunk_size(P: int, K: int, C: int) -> int:
    """Point-chunk size bounding the [Pc,K,C] one-hot and [3Pc,6C] dense A
    to ~96 MB each. Prefers a divisor of P (>= half the power-of-two
    budget) so the chunk scan needs no pad-concatenate of the slot arrays
    (profiled 0.38 ms/LM-iteration of pure copy at the r5 yardstick)."""
    budget = 96 * 1024 * 1024 // 4
    pc = min(budget // max(K * C, 1), budget // max(C * 18, 1))
    pc = max(256, 1 << max(int(pc).bit_length() - 1, 0))
    if P > pc and P % pc:
        for d in range(pc, pc // 2, -1):
            if P % d == 0:
                return d
    return min(P, pc)


def assemble_schur(H_cc_safe, W, Hpp_inv, slot_to_obs, slot_cam, slot_mask,
                   cam_mask, dtype=jnp.float32, axis_name=None, Wg=None):
    """Materialize the reduced camera system S = H_cc_safe - W H_pp^-1 W^T
    as [6C, 6C] in IC ORDER: flat index q = i * C + c (parameter i of
    camera c), NOT the (c, i) order of the matrix-free path.

    Why IC order: the one-hot expansion einsum "pkc,pkia->paic" emits its
    output with the camera axis minor — the layout the MXU wants — so XLA
    feeds the big S accumulation matmul directly. The previous "paci"
    (camera-major) layout forced a 29 MB transpose copy + reshape per point
    chunk, which PROFILED as the dominant assembly cost on v5e (~9.5 ms of
    the ~16 ms assembly in a 41.8 ms LM iteration; see BA_PROFILE_r03).
    IC-order assembly measures 2.5x faster. Downstream consumers
    (solve_reduced_chol / ba._solve_lm) flatten rhs and unflatten the
    solution in the same order, so the permutation never materializes.

    `dtype`: expansion/contraction element type. float32 (the default,
    matching BAConfig.dense_assemble_bf16=False) converges to machine
    zero; bfloat16 assembles ~equal speed after the layout fix but stalls
    deep convergence, so it is opt-in only.

    `axis_name`: the DISTRIBUTED dense path (point-aligned sharding,
    parallel/dist_ba): every device assembles the S contribution of its
    local point shard, then ONE [6C,6C] psum reduces the full system and
    the (small) Cholesky solve runs replicated. This replaces the
    matrix-free PCG's one-psum-per-CG-iteration pattern (~25+ latency-
    bound collectives per LM step — the 37%% two-process overhead at the
    yardstick problem, SCALING_r03) with ~3 collectives per step. H_cc_safe
    must already be globally reduced (build_normal_equations psums it).

    W: [O,6,3] flat per-observation coupling blocks (J_c^T J_p);
    Hpp_inv: [P,3,3]; slot maps from `group_slots`. Fixed cameras get
    identity rows/cols (the pinning the matrix-free matvec applies).
    """
    C = H_cc_safe.shape[0]
    P, K = slot_to_obs.shape
    if Wg is None:
        # Standalone use; the LM loop passes Wg from the fused build gather
        # (ba.build_normal_equations) so W is gathered ONCE per iteration.
        Wg = slot_gather(W.reshape(-1, 18), slot_to_obs, slot_mask)
    Wg = Wg.reshape(P, K, 6, 3).astype(dtype)
    Hpp_inv = Hpp_inv.astype(dtype)
    Pc = _chunk_size(P, K, C)
    if P % Pc:  # round P up to a chunk multiple with zero contributions
        extra = Pc - P % Pc
        Wg = jnp.concatenate([Wg, jnp.zeros((extra, K, 6, 3), Wg.dtype)])
        slot_cam = jnp.concatenate(
            [slot_cam, jnp.zeros((extra, K), slot_cam.dtype)]
        )
        Hpp_inv = jnp.concatenate(
            [Hpp_inv, jnp.zeros((extra, 3, 3), Hpp_inv.dtype)]
        )
        P += extra
    n_chunks = P // Pc
    cam_range = jnp.arange(C, dtype=slot_cam.dtype)

    def body(S_acc, chunk):
        cam_c, Wg_c, Minv_c = chunk
        oh = (cam_c[..., None] == cam_range).astype(dtype)        # [Pc,K,C]
        A = jnp.einsum("pkc,pkia->paic", oh, Wg_c,
                       preferred_element_type=dtype)              # [Pc,3,6,C]
        T = jnp.einsum("pab,pbic->paic", Minv_c, A,
                       preferred_element_type=dtype)
        # Contract (p,a) directly in 4-D: the earlier reshape-to-[3Pc,6C]
        # matmul forced XLA to materialize layout copies of A and T
        # (~1.5 ms/LM-iteration at the r5 yardstick — reshape bf16[6144,
        # 1200] + paired transposes in BA_PROFILE_r05's first cut).
        S_acc = S_acc + jnp.einsum("paic,pajd->icjd", A, T,
                                   preferred_element_type=jnp.float32)
        return S_acc, None

    chunks = (
        slot_cam.reshape(n_chunks, Pc, K),
        Wg.reshape(n_chunks, Pc, K, 6, 3),
        Hpp_inv.reshape(n_chunks, Pc, 3, 3),
    )
    S_sub, _ = jax.lax.scan(body, jnp.zeros((6, C, 6, C), jnp.float32),
                            chunks)
    if axis_name is not None:
        S_sub = lax.psum(S_sub, axis_name)
    idx = jnp.arange(C)
    # Diagonal camera blocks: S[(i1,c),(i2,c)] += H_cc[c,i1,i2].
    S = (-S_sub).at[:, idx, :, idx].add(H_cc_safe)
    S = S.reshape(6 * C, 6 * C)
    m = jnp.tile(cam_mask, 6)  # ic order: camera index minor
    return S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)


def band_plan(obs_point, obs_cam, n_points_pad: int, n_obs: int, C: int,
              K: int, max_width: int = 128):
    """Host-side feasibility plan for the BANDED Schur assembly.

    Real SLAM points are observed by a NARROW CONTIGUOUS camera range (a
    track over consecutive frames), and point ids grow in frame order, so
    a point chunk's observations span a small camera window. The banded
    assembly exploits that: per chunk, expand into a LOCAL band
    [Pc,3,6,B] at the chunk's base camera instead of the full [Pc,3,6,C]
    — the reduced-system contraction shrinks by (B/C)^2 in flops (the
    dense path executes ~190x the flops an ideal sparse Schur needs;
    r5 directive 4 / ref SPARSE_SCHUR src/bundle_adjuster.cpp:24).

    Returns (bases [G] int32, B, Pc) when every chunk's camera span fits a
    band of pow2 width B <= min(max_width, C/2); None otherwise (e.g.
    loop-closure points observed from distant cameras — those problems
    keep the dense expansion, which is always correct).

    REQUIRES obs_point sorted ascending (the BundleAdjuster layout).
    """
    obs_point = np.asarray(obs_point)
    obs_cam = np.asarray(obs_cam)
    if n_obs == 0:
        return None
    cmin = np.full(n_points_pad, np.iinfo(np.int32).max, np.int64)
    cmax = np.full(n_points_pad, -1, np.int64)
    np.minimum.at(cmin, obs_point[:n_obs], obs_cam[:n_obs])
    np.maximum.at(cmax, obs_point[:n_obs], obs_cam[:n_obs])
    span = int((cmax - np.where(cmax >= 0, cmin, 0)).max(initial=0)) + 1
    cap = min(max_width, max(C // 2, 1))

    def chunk_plan(B, Pc):
        G = (n_points_pad + Pc - 1) // Pc
        bases = np.zeros(G, np.int32)
        for g in range(G):
            lo, hi = g * Pc, min((g + 1) * Pc, n_points_pad)
            real = cmax[lo:hi] >= 0
            if not real.any():
                continue
            b0 = int(cmin[lo:hi][real].min())
            if int(cmax[lo:hi][real].max()) - b0 + 1 > B:
                return None
            bases[g] = b0
        return np.minimum(bases, max(C - B, 0)).astype(np.int32)

    # For each candidate band width take the LARGEST pow2 chunk whose
    # per-chunk camera span still fits (the [Pc,K,B] expansion memory
    # budget caps Pc from above), then pick the width minimizing a simple
    # cost model: per-chunk scan-step overhead (~40 us of tiny-op latency,
    # measured: B=16 with 79 chunks ran BARELY faster than dense while
    # B=32 with 10 chunks carries the same flops in 1/8 the steps) plus
    # the (6B)^2 contraction flops. Unlike the dense path, the chunk size
    # here is a locality choice, so it is passed explicitly to
    # assemble_schur_banded rather than re-derived.
    budget = 96 * 1024 * 1024 // 4
    B = 1 << (max(span, 2) - 1).bit_length()
    best = None
    best_score = float("inf")
    while B <= cap:
        pc_mem = max(256, 1 << max(int(
            budget // max(K * B, B * 18, 1)).bit_length() - 1, 0))
        Pc = min(1 << (n_points_pad - 1).bit_length(), pc_mem)
        while Pc >= 256:
            bases = chunk_plan(B, Pc)
            if bases is not None:
                G = len(bases)
                score = G * 40e-6 + (72 * n_points_pad * B * B) / 100e12
                if score < best_score:
                    best, best_score = (bases, B, Pc), score
                break
            Pc //= 2
        B *= 2
    return best


def assemble_schur_banded(H_cc_safe, Hpp_inv, slot_cam, slot_mask, cam_mask,
                          Wg, bases, B: int, Pc: int, dtype=jnp.float32):
    """Banded variant of assemble_schur: per point chunk, the one-hot
    expansion and the (p,a) contraction run at LOCAL band width B (camera
    columns [base, base+B) of that chunk) and the [6,B,6,B] band is added
    into S at the chunk's base offset. Identical math to the dense path
    whenever band_plan() declared feasibility (every slot's camera lies in
    its chunk's band); padding slots have Wg == 0 so their out-of-band
    local index contributes nothing either way.

    Single-device only (the distributed dense path keeps the full
    expansion — a psum of S is band-structure-oblivious anyway).
    """
    C = H_cc_safe.shape[0]
    P, K = slot_cam.shape
    G = (P + Pc - 1) // Pc
    assert G == bases.shape[0], (G, bases.shape)
    Wg = Wg.reshape(P, K, 6, 3).astype(dtype)
    Hpp_inv = Hpp_inv.astype(dtype)
    if P % Pc:
        extra = Pc - P % Pc
        Wg = jnp.concatenate([Wg, jnp.zeros((extra, K, 6, 3), Wg.dtype)])
        slot_cam = jnp.concatenate(
            [slot_cam, jnp.zeros((extra, K), slot_cam.dtype)])
        Hpp_inv = jnp.concatenate(
            [Hpp_inv, jnp.zeros((extra, 3, 3), Hpp_inv.dtype)])
        P += extra
    local_range = jnp.arange(B, dtype=slot_cam.dtype)

    def body(S_acc, chunk):
        base, cam_c, Wg_c, Minv_c = chunk
        lc = cam_c - base                                         # [Pc,K]
        oh = (lc[..., None] == local_range).astype(dtype)         # [Pc,K,B]
        A = jnp.einsum("pkc,pkia->paic", oh, Wg_c,
                       preferred_element_type=dtype)              # [Pc,3,6,B]
        T = jnp.einsum("pab,pbic->paic", Minv_c, A,
                       preferred_element_type=dtype)
        band = jnp.einsum("paic,pajd->icjd", A, T,
                          preferred_element_type=jnp.float32)     # [6,B,6,B]
        sl = lax.dynamic_slice(S_acc, (0, base, 0, base), (6, B, 6, B))
        S_acc = lax.dynamic_update_slice(S_acc, sl + band,
                                         (0, base, 0, base))
        return S_acc, None

    chunks = (
        bases,
        slot_cam.reshape(G, Pc, K),
        Wg.reshape(G, Pc, K, 6, 3),
        Hpp_inv.reshape(G, Pc, 3, 3),
    )
    S_sub, _ = jax.lax.scan(body, jnp.zeros((6, C, 6, C), jnp.float32),
                            chunks)
    idx = jnp.arange(C)
    S = (-S_sub).at[:, idx, :, idx].add(H_cc_safe)
    S = S.reshape(6 * C, 6 * C)
    m = jnp.tile(cam_mask, 6)
    return S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)


def solve_reduced_chol(S_ic, b_c, cam_mask):
    """Direct solve of the IC-ordered reduced system by Cholesky.

    XLA's TPU Cholesky on the windowed S (6C <= ~3k) measures ~0.2 ms —
    versus ~13 ms for 100 block-Jacobi PCG iterations (each a tiny
    latency-bound matvec in a sequential while loop; BA_PROFILE_r03) — and
    is exact, so the LM step quality is strictly better. S is SPD by
    damping + identity rows for fixed cameras.

    b_c: [C,6] camera gradient. Returns dc [C,6].
    """
    C = b_c.shape[0]
    rhs = (b_c * cam_mask[:, None]).T.reshape(-1)  # ic order
    L = jnp.linalg.cholesky(S_ic)
    x = jax.scipy.linalg.cho_solve((L, True), rhs)
    return x.reshape(6, C).T * cam_mask[:, None]
