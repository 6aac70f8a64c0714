"""REAL 2-process jax.distributed run of the multi-host data path.

The other distributed tests emulate process_count()==2 by monkeypatching;
this one actually spawns two CPU-backend processes with a live
coordinator and drives the production helpers
(`distributed.initialize` -> `global_data_mesh` ->
`shard_dataset_indices` -> `host_local_batch_to_global` -> a jitted
global-mean reduction) across them, asserting both processes observe the
same value — the value of the FULL dataset batch, proving the global
batch really assembled from the two disjoint host stripes.
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = r"""
import os, sys
import numpy as np
# must be set before jax import: 2 virtual CPU devices per process
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.environ["DSF_REPO"])
import jax
# multi-process CPU needs a cross-host collectives client; and jax may
# be PRE-IMPORTED with the axon platform by the environment, so force
# the cpu backend via config, not env (same dance as dryrun_multichip)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from dsf_tpu.parallel import distributed as dist

pid = int(sys.argv[1])
ok = dist.initialize(coordinator_address=os.environ["DSF_COORD"],
                     num_processes=2, process_id=pid)
assert ok, "initialize() returned False under 2 processes"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

mesh = dist.global_data_mesh()
N, BATCH = 32, 8
rows = dist.shard_dataset_indices(N, batch_size=BATCH, seed=5)
assert rows.shape == (N // BATCH, BATCH // 2), rows.shape

# dataset[i] = i; this host loads ONLY its stripe of global batch 0
host_batch = {"x": rows[0].astype(np.float32).reshape(-1, 1)}
gbatch = dist.host_local_batch_to_global(mesh, host_batch)
assert gbatch["x"].shape == (BATCH, 1)

@jax.jit
def global_mean(b):
    return b["x"].mean()

val = float(global_mean(gbatch))
# both stripes together are exactly the first permutation batch
rng = np.random.RandomState(5)
expect = float(rng.permutation(N)[:BATCH].mean())
assert abs(val - expect) < 1e-5, (val, expect)
print(f"WORKER_OK {pid} {val:.4f}", flush=True)
"""


def test_two_process_data_path(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ, DSF_COORD=addr,
               DSF_REPO=os.path.dirname(os.path.dirname(__file__)))
    # the workers force their own backend config
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
    # both processes computed the same global value
    v0 = [l for l in outs[0].splitlines() if l.startswith("WORKER_OK")][0]
    v1 = [l for l in outs[1].splitlines() if l.startswith("WORKER_OK")][0]
    assert v0.split()[-1] == v1.split()[-1]
