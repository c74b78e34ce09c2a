"""Scaling-mechanism assertions for the distributed BA path.

Wall-clock scaling efficiency cannot be measured meaningfully on this
container (2 physical cores shared by all virtual devices — XLA:CPU already
uses both cores for the 1-device run, so 1->2 virtual devices is compute
bound at ~50% by construction; see BASELINE.md). What CAN be pinned without
real chips is the mechanism that produces scaling on hardware:

- the observation arrays of the sharded solve are genuinely partitioned
  1/N per device (per-device FLOPs and HBM traffic drop proportionally),
- the partitions are balanced,
- the collective volume per LM step is O(C + P) state, independent of the
  observation count (so the ICI term stays flat as obs scale),
- and the sharded result equals the single-device result
  (tests/test_dist_ba.py asserts the numerics; re-checked here 1 vs 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_orb_slam_tpu.apps.scaling_bench import make_problem
from stereo_orb_slam_tpu.config import BAConfig
from stereo_orb_slam_tpu.parallel.dist_ba import shard_problem, sharded_lm_step
from stereo_orb_slam_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("n_dev", [2, 8])
def test_obs_arrays_partition_evenly(n_dev):
    mesh = make_mesh(n_dev)
    cfg = BAConfig(cg_iterations=5)
    prob = make_problem(C=16, P=512, obs_per_cam=64)
    step = sharded_lm_step(mesh, cfg)
    prob_sharded = shard_problem(mesh, prob)
    out, *_ = step(prob_sharded, jnp.float32(1e-4))

    O = prob.obs_uv.shape[0]
    shards = prob_sharded.obs_uv.addressable_shards
    assert len(shards) == n_dev
    sizes = {s.data.shape[0] for s in shards}
    assert sizes == {O // n_dev}, "observation shards must be balanced 1/N"
    # Replicated state (the per-step collective payload) is O(C+P), not O(O).
    assert prob_sharded.pose6.addressable_shards[0].data.shape[0] == 16
    assert prob_sharded.points.addressable_shards[0].data.shape[0] == 512


def test_sharded_equals_single_device():
    cfg = BAConfig(cg_iterations=10)
    prob = make_problem(C=12, P=256, obs_per_cam=48)

    from stereo_orb_slam_tpu.backend.ba import lm_step_impl

    p1, lam1, acc1, c0_1, c1_1 = jax.jit(
        lambda p, l: lm_step_impl(p, l, cfg)
    )(prob, jnp.float32(1e-4))

    mesh = make_mesh(2)
    step = sharded_lm_step(mesh, cfg)
    p2, lam2, acc2, c0_2, c1_2 = step(shard_problem(mesh, prob),
                                      jnp.float32(1e-4))
    np.testing.assert_allclose(float(c0_1), float(c0_2), rtol=1e-5)
    # f32 reduction order differs across shards and amplifies through the
    # CG iterations: same tolerance class as tests/test_dist_ba.py.
    np.testing.assert_allclose(float(c1_1), float(c1_2), rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(p1.pose6), np.asarray(p2.pose6), atol=2e-3
    )


def test_point_aligned_collectives_are_camera_sized_only():
    """The point-aligned distributed LM step's compiled HLO must contain
    all-reduces ONLY over camera-sized tensors (O(C) collective volume) —
    never point- or observation-sized ones. This is the mechanism behind
    the multi-host scaling claim (SCALING_r03.json)."""
    from benchmarks.scaling_evidence import collective_report

    rep = collective_report(2, C=40, P=2000, obs_per_cam=100,
                            cg_iterations=10)
    assert rep["obs_sized_all_reduces"] == [], rep
    census = rep["all_reduce_shape_census_static"]
    assert census, "expected at least one all-reduce in the distributed step"
    for key in census:
        # Every reduced tensor is camera-sized: [C, *] rows, the [6C,6C]
        # dense reduced system (ONE psum per LM step — the r4 replacement
        # for a [C,6] psum per CG iteration), or a scalar.
        # The dense reduced system psums in its 4-D [6,C,6,C] form since
        # the r5 tensordot assembly (same bytes as the old [6C,6C]).
        assert (key.startswith("f32[40,") or key == "f32[240, 240]"
                or key == "f32[6, 40, 6, 40]" or key == "f32[]"), census
    # Collective COUNT is the scaling lever at windowed sizes: the dense
    # distributed Schur runs ~5 latency-bound reductions per LM step.
    assert sum(census.values()) <= 6, census
