"""Pallas fused Hamming top-2 kernel vs the XLA/NumPy oracle (interpreter
mode on CPU; the same kernel compiles for real on TPU)."""

import jax.numpy as jnp
import numpy as np

from stereo_orb_slam_tpu.ops import match
from stereo_orb_slam_tpu.ops.pallas.hamming import hamming_top2


def test_kernel_matches_oracle(rng):
    n, m = 256, 384
    a = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, (m, 8), dtype=np.uint32)
    vt = np.ones(m, bool)
    vt[100:110] = False

    d1, i1, d2 = hamming_top2(
        match.signs_from_packed(jnp.asarray(a)),
        match.signs_from_packed(jnp.asarray(b)),
        jnp.asarray(vt),
        interpret=True,
    )

    dist = np.asarray(
        match.hamming_matrix(jnp.asarray(a), jnp.asarray(b), valid_t=jnp.asarray(vt))
    )
    ref_i1 = dist.argmin(axis=1)
    ref_d1 = dist.min(axis=1)
    part = np.partition(dist, 1, axis=1)
    ref_d2 = part[:, 1]

    np.testing.assert_allclose(np.asarray(d1), ref_d1)
    np.testing.assert_allclose(np.asarray(d2), ref_d2)
    # argmin may tie; require the distances at the chosen index to match.
    np.testing.assert_allclose(dist[np.arange(n), np.asarray(i1)], ref_d1)


def test_kernel_all_invalid_train(rng):
    a = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
    vt = np.zeros(128, bool)
    d1, i1, d2 = hamming_top2(
        match.signs_from_packed(jnp.asarray(a)),
        match.signs_from_packed(jnp.asarray(b)),
        jnp.asarray(vt),
        interpret=True,
    )
    assert np.all(np.asarray(d1) == 257.0)
    assert np.all(np.asarray(d2) == 257.0)


def test_match_descriptors_pallas_path_equals_xla(rng):
    n = 256
    a = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    # Make half of b near-copies of a so some matches pass the gates.
    b = a.copy()
    b[::2] = rng.integers(0, 2**32, (n // 2, 8), dtype=np.uint32)
    va = np.ones(n, bool)
    vb = np.ones(n, bool)

    idx_x, ok_x, d_x = match.match_descriptors(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(va), jnp.asarray(vb),
        use_pallas=False,
    )
    # interpret-mode Pallas path via direct kernel call equivalence is
    # covered above; here just ensure the XLA path finds the planted matches.
    idx_x, ok_x = np.asarray(idx_x), np.asarray(ok_x)
    planted = np.arange(1, n, 2)
    assert ok_x[planted].mean() > 0.9
    assert (idx_x[planted] == planted).mean() > 0.9
