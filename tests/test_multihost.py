"""Two-process jax.distributed smoke test of the --multihost bring-up path.

The reference gets multi-node training implicitly from Lightning DDP
(reference train.py:271-272); this repo's equivalent is
`parallel.mesh.init_distributed` + the same jitted step over a global mesh.
Real DCN behavior needs a pod, but the process-group plumbing (coordinator
handshake, global device visibility, cross-process psum through a jitted
step) is fully exercisable with two CPU processes on one machine.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
os.environ["JAX_PLATFORMS"] = "cpu"
proc_id = int(sys.argv[1])
port = sys.argv[2]

from ngp_pl_tpu.parallel.mesh import data_mesh, init_distributed

pid = init_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=2, process_id=proc_id)
assert pid == proc_id

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()       # 1 CPU dev/process
assert len(jax.local_devices()) == 1

mesh = data_mesh()                                        # global data mesh
repl = NamedSharding(mesh, P())
shard = NamedSharding(mesh, P("data"))

# params replicated, "batch" sharded across processes; the grad of a
# replicated param against a sharded batch forces XLA to insert the
# cross-process psum — the exact structure of the training step
w = jax.device_put(jnp.asarray(3.0), repl)
local = jnp.full((4,), float(proc_id + 1))                # host-local shard
x = jax.make_array_from_single_device_arrays(
    (8,), shard, [jax.device_put(local, jax.local_devices()[0])])

@jax.jit
def loss(w, x):
    return jnp.sum(w * x)

g = jax.grad(loss)(w, x)                 # = sum(x) over BOTH processes
val = float(jax.device_get(g))
assert val == 4.0 * 1 + 4.0 * 2, val
print(f"proc {proc_id}: global grad {val} ok", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    if os.environ.get("NGP_SKIP_MULTIHOST"):
        pytest.skip("multihost smoke disabled")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "REPO_ROOT": repo, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": ""}
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), port],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "ok" in out
