"""Multi-sequence tracking sharded across a device mesh: 8 sequences over 8
virtual devices must produce the same results as unsharded batching."""

import jax
import numpy as np
import pytest

from stereo_orb_slam_tpu.config import FrontendConfig, RansacConfig
from stereo_orb_slam_tpu.parallel.mesh import make_mesh
from stereo_orb_slam_tpu.parallel.multi_seq import MultiSequenceSLAM
from tests.synth import PlaneScene


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_sharded_multi_seq(rng, mesh8):
    fe = FrontendConfig(num_features=128)
    rc = RansacConfig(num_hypotheses=32)
    scenes = [PlaneScene(rng, h=120, w=160, fx=100.0, cx=80.0, cy=60.0)
              for _ in range(8)]
    rigs = [s.make_rig() for s in scenes]
    steps = [0.1 + 0.02 * i for i in range(8)]

    sharded = MultiSequenceSLAM(rigs, fe, rc, mesh=mesh8, seed=3)
    plain = MultiSequenceSLAM(rigs, fe, rc, mesh=None, seed=3)

    for i in range(3):
        il = np.stack([s.render(i * st) for s, st in zip(scenes, steps)])
        ir = np.stack(
            [s.render(i * st, right=True) for s, st in zip(scenes, steps)]
        )
        Ts_sharded = sharded.process(il, ir)
        Ts_plain = plain.process(il, ir)
        for s_idx in range(8):
            np.testing.assert_allclose(
                Ts_sharded[s_idx], Ts_plain[s_idx], atol=1e-4,
                err_msg=f"seq {s_idx} frame {i}",
            )

    # Motion sanity: the tiny 120x160 test images make individual sequences
    # occasionally drop frames, so require MOST sequences to have tracked to
    # ~2 steps (the sharded==plain equality above is the property under
    # test; per-sequence accuracy is covered by test_multi_seq.py).
    good = 0
    for s_idx, st in enumerate(steps):
        w = sharded.vos[s_idx].world
        if w.num_frames >= 2:
            x_final = w.pose_global[w.num_frames - 1][0, 3]
            good += abs(x_final - 2 * st) < 0.08
    assert good >= 5, f"only {good}/8 sequences tracked"
