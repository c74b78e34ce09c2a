"""2-process multihost smoke test (VERDICT round-1 item 4).

Spawns two real OS processes, initializes `jax.distributed` through
parallel/multihost.py on the CPU backend, and runs a cross-process psum —
the exact collective the distributed BA/pose-graph solvers reduce with.
This is the standard way to exercise the multi-host path without a pod
(SURVEY.md §5.8); on a TPU pod the same code spans the slice.
"""

import json
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys, os, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # single local device per process
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from stereo_orb_slam_tpu.parallel import multihost

pid = int(sys.argv[1])
info = multihost.initialize(coordinator_address="localhost:" + sys.argv[2],
                            num_processes=2, process_id=pid)
assert multihost.is_primary() == (pid == 0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = Mesh(np.asarray(jax.devices()), ("obs",))
f = jax.jit(shard_map(lambda x: jax.lax.psum(x, "obs"), mesh=mesh,
                      in_specs=P("obs"), out_specs=P()))
x = jax.device_put(jnp.arange(2, dtype=jnp.float32) + 1.0,
                   NamedSharding(mesh, P("obs")))
y = f(x)
info["psum"] = float(np.asarray(y.addressable_shards[0].data).ravel()[0])
print("RESULT " + json.dumps(info))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(180)
def test_two_process_initialize_and_psum(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=repo))
    port = str(_free_port())

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    infos = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        infos.append(json.loads(lines[-1][len("RESULT "):]))

    for info in infos:
        assert info["process_count"] == 2
        assert info["global_devices"] == 2
        assert info["local_devices"] == 1
        # psum over per-device values {1.0, 2.0} across BOTH processes.
        assert info["psum"] == 3.0
    assert {i["process_index"] for i in infos} == {0, 1}
