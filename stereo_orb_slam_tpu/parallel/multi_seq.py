"""Concurrent multi-sequence SLAM (BASELINE.json config 4).

The reference is strictly single-sequence; here S sequences run the per-
frame front end CONCURRENTLY as one batched program: `frontend_step` is
vmapped over a leading sequence axis and the batch is sharded across the
device mesh (one or more sequences per chip). Host-side map bookkeeping
stays per-sequence (independent WorldMaps).

This is the throughput path for fleet-style processing: on a v5e-8 host,
8 sequences track in the wall-clock of one.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_orb_slam_tpu.config import FrontendConfig, RansacConfig
from stereo_orb_slam_tpu.frontend.odometer import (
    FrameSlots,
    VisualOdometer,
    empty_slots,
    frontend_step,
)
from stereo_orb_slam_tpu.geometry import camera as cam_mod
from stereo_orb_slam_tpu.worldmap import WorldMap


def batched_frontend_step(fe: FrontendConfig, rc: RansacConfig,
                          rectified=None):
    """vmap of the full per-frame front end over a sequence axis.

    Returns a jitted fn(imgs_l [S,H,W], imgs_r, prev: FrameSlots batched,
    prev_usable [S], keys [S], rig (batched pytree), max_dist [S]) -> StepResult
    with a leading S axis on every output.
    """
    def one(img_l, img_r, prev, prev_usable, key, rig, max_d, steer):
        return frontend_step(
            img_l, img_r, prev, prev_usable, key, rig, max_d, fe, rc,
            rectified, steer,
        )

    # steer is shared across the sequence axis (in_axes=None) and stays a
    # runtime parameter of the fused program.
    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, None)))


def stack_rigs(rigs: Sequence[cam_mod.StereoRig]) -> cam_mod.StereoRig:
    """Batch rigs into one pytree with a leading sequence axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *rigs)


def batch_slots(slots: Sequence[FrameSlots]) -> FrameSlots:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *slots)


class MultiSequenceSLAM:
    """Track S sequences concurrently; device compute fully batched."""

    def __init__(self, rigs: Sequence[cam_mod.StereoRig],
                 fe: Optional[FrontendConfig] = None,
                 rc: Optional[RansacConfig] = None,
                 mesh: Optional[Mesh] = None, seed: int = 0):
        self.fe = fe or FrontendConfig()
        self.rc = rc or RansacConfig()
        self.S = len(rigs)
        self.rig_batch = stack_rigs(rigs)
        self.max_d = jnp.stack(
            [jnp.asarray(r.max_sensible_distance(), jnp.float32) for r in rigs]
        )
        rect_flags = {bool(r.rectified) if isinstance(r.rectified, bool)
                      else bool(np.asarray(r.rectified)) for r in rigs}
        assert len(rect_flags) == 1, "all rigs must share the triangulation path"
        self.step = batched_frontend_step(self.fe, self.rc, rect_flags.pop())
        self.mesh = mesh

        # Per-sequence host state: a VisualOdometer each (device compute is
        # bypassed; we reuse only its bookkeeping).
        self.worlds = [WorldMap(feat_slots=self.fe.num_features) for _ in rigs]
        self.vos = [
            VisualOdometer(w, r, self.fe, self.rc, seed=seed + i)
            for i, (w, r) in enumerate(zip(self.worlds, rigs))
        ]
        self.prev = batch_slots(
            [empty_slots(self.fe.num_features) for _ in rigs]
        )
        self.initialized = np.zeros(self.S, bool)

    def process(self, imgs_l: np.ndarray, imgs_r: np.ndarray) -> List[np.ndarray]:
        """One frame for every sequence. imgs_*: [S,H,W]. Returns S rel poses."""
        # Draw from each sequence's own key stream so results are bit-equal
        # to running that sequence through its own VisualOdometer.
        subs = []
        for vo in self.vos:
            subs.append(jax.random.fold_in(vo._base_key, vo._frame_counter))
            vo._frame_counter += 1
        keys = jnp.stack(subs)
        il = jnp.asarray(imgs_l, jnp.float32)
        ir = jnp.asarray(imgs_r, jnp.float32)
        if self.mesh is not None:
            seq_sharding = NamedSharding(self.mesh, P("obs"))
            il = jax.device_put(il, seq_sharding)
            ir = jax.device_put(ir, seq_sharding)

        from stereo_orb_slam_tpu.ops import orb as orb_mod

        res = self.step(
            il, ir, self.prev, jnp.asarray(self.initialized), keys,
            self.rig_batch, self.max_d, orb_mod.steer_table(self.fe.oriented),
        )

        transforms = []
        new_prev = []
        for s in range(self.S):
            vo = self.vos[s]
            res_s = jax.tree.map(lambda x: x[s], res)
            trans = vo._ingest(res_s)
            transforms.append(trans)
            new_prev.append(vo.prev)
        self.prev = batch_slots(new_prev)
        self.initialized[:] = [vo.initialized for vo in self.vos]
        return transforms
