"""Closed-form BA Jacobians must match jax.jacfwd exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_orb_slam_tpu.backend import residuals


def test_closed_form_jacobians_match_autodiff(rng):
    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
    P_l = jnp.asarray(
        [[fx, 0, cx, 0], [0, fx, cy, 0], [0, 0, 1, 0]], jnp.float32
    )
    P_r = P_l.at[0, 3].set(-fx * b)

    n = 64
    pose6 = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.5, (n, 3)), rng.normal(0, 2.0, (n, 3))], 1
        ).astype(np.float32)
    )
    pts = jnp.asarray(
        np.stack(
            [rng.uniform(-10, 10, n), rng.uniform(-3, 3, n),
             rng.uniform(3, 40, n)], 1
        ).astype(np.float32)
    )
    uv = jnp.zeros((n, 4), jnp.float32)

    Jc_ad, Jp_ad = jax.vmap(
        residuals._jac_one, in_axes=(0, 0, 0, None, None)
    )(pose6, pts, uv, P_l, P_r)
    Jc_cf, Jp_cf = residuals.jacobians_closed(pose6, pts, P_l, P_r)

    np.testing.assert_allclose(np.asarray(Jc_cf), np.asarray(Jc_ad),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(Jp_cf), np.asarray(Jp_ad),
                               rtol=1e-3, atol=1e-2)


def test_closed_form_small_angle(rng):
    P_l = jnp.asarray([[100.0, 0, 50, 0], [0, 100, 50, 0], [0, 0, 1, 0]])
    P_r = P_l
    pose6 = jnp.asarray([[1e-9, 0, 0, 0.1, 0.2, 0.3]], jnp.float32)
    pts = jnp.asarray([[1.0, 0.5, 10.0]], jnp.float32)
    uv = jnp.zeros((1, 4), jnp.float32)
    Jc_ad, Jp_ad = jax.vmap(
        residuals._jac_one, in_axes=(0, 0, 0, None, None)
    )(pose6, pts, uv, P_l, P_r)
    Jc_cf, Jp_cf = residuals.jacobians_closed(pose6, pts, P_l, P_r)
    np.testing.assert_allclose(np.asarray(Jc_cf), np.asarray(Jc_ad),
                               rtol=1e-4, atol=1e-4)


def test_build_rows_soa_matches_einsum_formulation(rng):
    """The unrolled SoA build (residuals.build_rows_soa) must reproduce the
    reference einsum formulation of the normal-equation rows bit-for-near:
    same whitened blocks J^T J, J^T r, W, and robust cost."""
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.backend import residuals as res

    O, C, P = 257, 7, 50
    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
    P_l = np.array([[fx, 0, cx, 0], [0, fx, cy, 0], [0, 0, 1, 0]], np.float32)
    P_r = P_l.copy()
    P_r[0, 3] = -fx * b
    pose6 = rng.normal(0, 0.3, (C, 6)).astype(np.float32)
    pts = np.stack([rng.uniform(-5, 5, P), rng.uniform(-3, 3, P),
                    rng.uniform(4, 30, P)], 1).astype(np.float32)
    oc = rng.integers(0, C, O).astype(np.int32)
    op = rng.integers(0, P, O).astype(np.int32)
    uv = rng.uniform(0, 800, (O, 4)).astype(np.float32)
    w = (rng.uniform(0, 1, O) > 0.1).astype(np.float32)

    p6 = jnp.asarray(pose6)[jnp.asarray(oc)]
    pt = jnp.asarray(pts)[jnp.asarray(op)]
    r, J_c, J_p, cost0 = res.residuals_and_jacobians_gathered(
        p6, pt, jnp.asarray(uv), jnp.asarray(w), jnp.asarray(P_l),
        jnp.asarray(P_r), 1.0,
    )
    JcT_Jc = jnp.einsum("oki,okj->oij", J_c, J_c).reshape(O, 36)
    JcT_r = jnp.einsum("oki,ok->oi", J_c, r)
    JpT_Jp = jnp.einsum("oki,okj->oij", J_p, J_p).reshape(O, 9)
    JpT_r = jnp.einsum("oki,ok->oi", J_p, r)
    W_ref = jnp.einsum("oki,okj->oij", J_c, J_p)

    cam_rows, pt_rows, W, cost1 = res.build_rows_soa(
        p6, pt, jnp.asarray(uv), jnp.asarray(w), jnp.asarray(P_l),
        jnp.asarray(P_r), 1.0,
    )
    np.testing.assert_allclose(cam_rows[:, :36], JcT_Jc, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(cam_rows[:, 36:], JcT_r, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(pt_rows[:, :9], JpT_Jp, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(pt_rows[:, 9:], -JpT_r, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(W, W_ref, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(cost1, cost0, rtol=1e-5)
