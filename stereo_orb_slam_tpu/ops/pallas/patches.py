"""Pallas TPU kernel: batched patch extraction at dynamic corner positions.

The XLA path (ops/orb.py extract_patches) vmaps `lax.dynamic_slice` over the
N corners — N independent slice programs, measured ~0.7 ms/image for 1024
32x32 patches on v5e (slice-COUNT bound, not byte bound: shrinking the patch
or the dtype barely moved it). The BRIEF/ORB describer is the front end's
second-hottest stage (ref `src/visual_odometer.cpp:256-259` computes ORB on
the detected corners), so this is one of the front-end Pallas targets
(SURVEY.md §7 step 2).

Kernel formulation: the whole (smoothed, padded) image is staged once into
VMEM — KITTI-sized bf16 frames are ~1 MB, a few % of the ~16 MB VMEM — and
each grid step copies B patches out of it with dynamic-start vector loads
(`pl.ds`). The per-corner (y, x) offsets arrive via scalar prefetch, so the
loads issue back-to-back from SMEM-resident indices with no per-slice
program overhead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 16  # sublane alignment that satisfies every dtype's tile rule


def _kernel(yx_ref, img_ref, out_ref, *, block: int, patch: int):
    # Mosaic requires ALIGNED dynamic starts for vector loads, so each
    # corner loads an aligned (patch+SUBL) x (patch+LANES) window, rolls the
    # sub-tile residual (dy, dx) to the origin, and writes the static
    # [:patch, :patch] corner.
    i = pl.program_id(0)
    win_r = -(-(patch + SUBL) // SUBL) * SUBL
    win_c = -(-(patch + LANES) // LANES) * LANES  # rolls need lane-aligned shapes
    for j in range(block):
        n = i * block + j
        y = yx_ref[0, n]
        x = yx_ref[1, n]
        y0 = (y // SUBL) * SUBL
        x0 = (x // LANES) * LANES
        win = img_ref[
            pl.ds(pl.multiple_of(y0, SUBL), win_r),
            pl.ds(pl.multiple_of(x0, LANES), win_c),
        ]
        # Lane residual: dynamic lane roll (correct under Mosaic). Sublane
        # residual: a SUBL-way switch over static row slices — both the
        # sublane roll of a dynamically sliced window and one-hot matmuls
        # with sub-128 contraction dims miscompile on v5e Mosaic (verified),
        # while static-offset slices relayout correctly.
        win = pltpu.roll(win, shift=-(x - x0), axis=1)
        out_ref[j] = jax.lax.switch(
            y - y0,
            [lambda w=win, d=d: w[d:d + patch, :patch] for d in range(SUBL)],
        )


@partial(jax.jit, static_argnames=("patch", "block", "interpret"))
def extract_patches_pallas(img_padded, ys, xs, patch: int, block: int = 8,
                           interpret: bool = False):
    """[N, patch, patch] patches with top-left corners at (ys, xs).

    Args:
      img_padded: [H, W] f32 image (Mosaic's dynamic rotate is 32-bit only),
        already padded so every (y, x) start is in bounds (y + patch <= H,
        x + patch <= W). Downcast the OUTPUT for MXU consumers; XLA fuses it.
      ys, xs: [N] int32 top-left offsets; N must be a multiple of `block`.
    """
    n = ys.shape[0]
    assert n % block == 0, (n, block)
    H, W = img_padded.shape
    # Aligned-window margins: the kernel reads up to
    # (align_down(y) + win_r, align_down(x) + win_c).
    win_r = -(-(patch + SUBL) // SUBL) * SUBL
    win_c = -(-(patch + LANES) // LANES) * LANES
    Hp = -(-(H - patch + win_r) // SUBL) * SUBL
    Wp = -(-(W - patch + win_c) // LANES) * LANES
    img_padded = jnp.pad(img_padded, ((0, Hp - H), (0, Wp - W)))
    yx = jnp.stack([ys, xs]).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole image, staged once
        ],
        out_specs=pl.BlockSpec(
            (block, patch, patch), lambda i, yx: (i, 0, 0)
        ),
    )
    return pl.pallas_call(
        partial(_kernel, block=block, patch=patch),
        out_shape=jax.ShapeDtypeStruct((n, patch, patch), img_padded.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(yx, img_padded)
