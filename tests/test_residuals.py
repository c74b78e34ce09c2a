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
