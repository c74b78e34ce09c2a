"""Multi-host initialization helpers.

The reference is single-process (SURVEY.md §0). For pod-slice runs
(BASELINE.json configs 5: N>=2 hosts), JAX needs `jax.distributed`
initialization before any backend use; after that, `jax.devices()` spans the
slice, the meshes built by parallel/mesh.py cover all chips, and the
observation-sharded solvers' `psum`s ride ICI within a slice and DCN across
hosts automatically.

Usage (same program on every host):

    from stereo_orb_slam_tpu.parallel import multihost
    multihost.initialize()          # env-driven (TPU pods auto-configure)
    mesh = make_mesh()              # all chips across all hosts
"""

from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed (no-op if already initialized or single
    process). On TPU pods all arguments are discovered from the environment.

    Returns a summary dict {process_index, process_count, local_devices,
    global_devices}.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # Already initialized, or single-process context without coordinator
        # info — both fine: fall through to report the current topology.
        pass

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    """True on the host that should write artifacts / logs."""
    import jax

    return jax.process_index() == 0
