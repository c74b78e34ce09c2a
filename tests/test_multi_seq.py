"""Concurrent multi-sequence tracking: batched results must equal running
each sequence alone."""

import numpy as np

from stereo_orb_slam_tpu.config import FrontendConfig, RansacConfig
from stereo_orb_slam_tpu.frontend.odometer import VisualOdometer
from stereo_orb_slam_tpu.parallel.multi_seq import MultiSequenceSLAM
from stereo_orb_slam_tpu.worldmap import WorldMap
from tests.synth import PlaneScene


def test_multi_seq_matches_single(rng):
    fe = FrontendConfig(num_features=256)
    rc = RansacConfig(num_hypotheses=64)

    scenes = [PlaneScene(rng), PlaneScene(rng)]
    rigs = [s.make_rig() for s in scenes]
    steps = [0.2, 0.25]
    n_frames = 4

    multi = MultiSequenceSLAM(rigs, fe, rc, seed=7)
    multi_T = [[] for _ in scenes]
    for i in range(n_frames):
        il = np.stack([s.render(i * st) for s, st in zip(scenes, steps)])
        ir = np.stack(
            [s.render(i * st, right=True) for s, st in zip(scenes, steps)]
        )
        for s_idx, T in enumerate(multi.process(il, ir)):
            multi_T[s_idx].append(T)

    # Reference: run each sequence through its own odometer (same seeds).
    for s_idx, (scene, st) in enumerate(zip(scenes, steps)):
        world = WorldMap()
        vo = VisualOdometer(world, rigs[s_idx], fe, rc, seed=7 + s_idx)
        for i in range(n_frames):
            T_single = vo.track(
                scene.render(i * st), scene.render(i * st, right=True)
            )
            np.testing.assert_allclose(
                multi_T[s_idx][i], T_single, atol=1e-4,
                err_msg=f"seq {s_idx} frame {i}",
            )

    # Both sequences recover their own motion (tolerance scales with the
    # stereo depth-uncertainty of the synthetic scenes).
    for s_idx, st in enumerate(steps):
        for T in multi_T[s_idx][1:]:
            np.testing.assert_allclose(T[:3, 3], [st, 0, 0], atol=0.05)
