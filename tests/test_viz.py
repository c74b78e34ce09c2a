"""Debug visualization renders valid PNGs for a real StepResult."""

import os

import numpy as np

from stereo_orb_slam_tpu.frontend.odometer import VisualOdometer
from stereo_orb_slam_tpu.utils import viz
from stereo_orb_slam_tpu.worldmap import WorldMap
from tests.synth import PlaneScene


def test_debug_views(rng, tmp_path):
    scene = PlaneScene(rng)
    rig = scene.make_rig()
    world = WorldMap()
    vo = VisualOdometer(world, rig, seed=0)

    img0_l, img0_r = scene.render(0.0), scene.render(0.0, right=True)
    vo.track(img0_l, img0_r)
    prev_slots = vo.prev

    img1_l, img1_r = scene.render(0.2), scene.render(0.2, right=True)
    # Re-run the device step to get a StepResult for viz.
    import jax
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.frontend.odometer import frontend_step

    res = frontend_step(
        jnp.asarray(img1_l), jnp.asarray(img1_r), prev_slots,
        jnp.asarray(True), jax.random.key(1), rig,
        jnp.float32(vo.max_distance), vo.fe, vo.rc,
    )

    viz.save_frame_debug(
        str(tmp_path), 1, img1_l, img1_r, res,
        prev_img=img0_l, prev_slots=prev_slots,
    )
    for name in ["stereo_000001.png", "tracking_000001.png", "temporal_000001.png"]:
        p = os.path.join(str(tmp_path), name)
        assert os.path.exists(p)
        from PIL import Image

        with Image.open(p) as im:
            assert im.size[0] > 0
