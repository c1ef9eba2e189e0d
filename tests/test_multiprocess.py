"""Two-process jax.distributed integration test on the CPU backend.

Exercises the real multi-host machinery (coordinator service, global device
view, cross-process collectives, process_allgather, assert_equal) that the
virtual 8-device mesh cannot: each subprocess owns its own devices and the
dp axis spans both processes, like hosts in a TPU pod.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4  # 2 local x 2 processes

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils

from ddpo_tpu.parallel import MeshConfig, create_mesh, replicated
from ddpo_tpu.parallel.collectives import all_processes_equal, worker_sum

mesh = create_mesh(MeshConfig(dp=-1, tp=1))
assert mesh.devices.size == 4

# cross-process scalar sum (reference: utils/array.py worker_sum)
total = worker_sum(mesh, 1 + jax.process_index())
assert total == 3.0, total

# allgather + divergence check
gathered = multihost_utils.process_allgather(
    np.full((2,), jax.process_index(), np.float32), tiled=True
)
assert gathered.shape == (4,), gathered.shape
all_processes_equal({"x": np.ones(3)}, "sync check")

# a dp-sharded computation across both processes
from jax.sharding import NamedSharding, PartitionSpec as P

global_x = jnp.arange(8.0)
arrs = multihost_utils.host_local_array_to_global_array(
    np.arange(8.0).reshape(2, 4)[jax.process_index()], mesh, P("dp")
)
result = jax.jit(
    lambda x: jnp.sum(x), in_shardings=NamedSharding(mesh, P("dp")),
    out_shardings=NamedSharding(mesh, P()),
)(arrs)
total = float(np.asarray(result.addressable_shards[0].data))
assert total == 28.0, total

print(f"WORKER_{jax.process_index()}_OK")
"""


def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..")
    ) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip axon backend registration

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for i, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=200)
        outputs.append(out)
        assert proc.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    assert "WORKER_0_OK" in outputs[0]
    assert "WORKER_1_OK" in outputs[1]
