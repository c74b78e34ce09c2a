"""Pallas patch-extraction kernel: interpreter-mode parity vs direct slicing.

The compiled kernel's TPU-specific workarounds (lane roll + sublane switch;
see ops/pallas/patches.py) were additionally verified bit-exact against
numpy slicing on a real v5e, including the Mosaic miscompiles they avoid
(sublane roll of a dynamically sliced window, sub-128 contraction matmuls).
"""

import numpy as np
import jax.numpy as jnp

from stereo_orb_slam_tpu.ops.pallas.patches import extract_patches_pallas


def test_patches_interpret_parity(rng):
    H, W, patch, n = 201, 333, 32, 64
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    ys = jnp.asarray(rng.integers(0, H - patch, n).astype(np.int32))
    xs = jnp.asarray(rng.integers(0, W - patch, n).astype(np.int32))
    out = extract_patches_pallas(img, ys, xs, patch, interpret=True)
    ref = np.stack([
        np.asarray(img)[y:y + patch, x:x + patch]
        for y, x in zip(np.asarray(ys), np.asarray(xs))
    ])
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_patches_interpret_parity_alignment_edges(rng):
    """Exercise every sublane/lane residual class, incl. 0 and maxima."""
    H, W, patch = 96, 512, 32
    ys_l, xs_l = [], []
    for dy in (0, 1, 7, 8, 15):
        for dx in (0, 1, 127, 128, 129, 255):
            ys_l.append(16 + dy)
            xs_l.append(min(dx, W - patch))
    while len(ys_l) % 8:
        ys_l.append(0)
        xs_l.append(0)
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    ys = jnp.asarray(np.asarray(ys_l, np.int32))
    xs = jnp.asarray(np.asarray(xs_l, np.int32))
    out = extract_patches_pallas(img, ys, xs, patch, interpret=True)
    ref = np.stack([
        np.asarray(img)[y:y + patch, x:x + patch]
        for y, x in zip(np.asarray(ys), np.asarray(xs))
    ])
    np.testing.assert_array_equal(np.asarray(out), ref)
